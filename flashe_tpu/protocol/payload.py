"""Wire payloads for model uploads/downloads.

Replaces JZFTransferableWeights (reference jzf_weights.py:140-293): a
flattened model travels as one lane array plus metadata (degree, idx_list,
element count).  `pack()` produces the reference's exact bit-concatenated
byte layout (flashe_tpu/ops/pack.py) for transports that serialize; the
in-memory transport passes device arrays by reference, so simulation pays
no packing cost unless asked to (wire_pack=True exercises the full path).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import numpy as np

from flashe_tpu.ops import pack as packops

__all__ = ["ModelPayload", "partition_lanes", "merge_lane_parts"]


@dataclasses.dataclass
class ModelPayload:
    lanes: Any  # uint32 lanes/limbs, float32 (plain), or None if packed
    n_elements: int
    int_bits: Optional[int]  # None => unquantized float payload
    degree: Optional[float] = None
    idx_list: Optional[list] = None
    shape_list: Optional[list] = None  # partition bookkeeping
    packed: Optional[bytes] = None
    packed_n_lanes: Optional[int] = None

    def pack(self) -> "ModelPayload":
        """Serialize lanes to the reference bit-packed wire bytes."""
        if self.int_bits is None or self.packed is not None:
            return self
        lanes = np.asarray(self.lanes)
        data = packops.pack_lanes(lanes, self.int_bits)
        return dataclasses.replace(
            self, lanes=None, packed=data, packed_n_lanes=int(lanes.shape[0])
        )

    def unpack(self) -> "ModelPayload":
        if self.packed is None:
            return self
        lanes = packops.unpack_lanes(self.packed, self.packed_n_lanes,
                                     self.int_bits)
        return dataclasses.replace(self, lanes=lanes, packed=None)

    @property
    def n_lanes(self) -> int:
        if self.lanes is not None:
            return int(np.asarray(self.lanes).shape[0])
        return self.packed_n_lanes

    def wire_bytes(self) -> int:
        if self.packed is not None:
            return len(self.packed)
        arr = np.asarray(self.lanes)
        if arr.dtype == object:  # big-int ciphertexts (Paillier)
            return int(sum((int(v).bit_length() + 7) // 8
                           for v in arr.ravel()))
        if self.int_bits is None:
            return int(arr.nbytes)
        return packops.packed_nbytes(self.n_lanes, self.int_bits)


def partition_lanes(payload: ModelPayload, num_partitions: int) -> List[ModelPayload]:
    """Split a payload into chunks for flow-controlled transfer
    (reference jzf_aggregator.py:72-90)."""
    lanes = np.asarray(payload.lanes)
    parts = np.array_split(lanes, num_partitions, axis=0)
    out = []
    for i, p in enumerate(parts):
        out.append(
            ModelPayload(
                lanes=p,
                n_elements=payload.n_elements if i == 0 else 0,
                int_bits=payload.int_bits,
                degree=payload.degree if i == 0 else None,
                idx_list=payload.idx_list if i == 0 else None,
                shape_list=[len(q) for q in parts] if i == 0 else None,
            )
        )
    return out


def merge_lane_parts(parts: List[ModelPayload]) -> ModelPayload:
    """Inverse of partition_lanes (reference merge_at_* jzf_aggregator.py:93-132)."""
    lanes = np.concatenate([np.asarray(p.unpack().lanes) for p in parts], axis=0)
    head = parts[0]
    return ModelPayload(
        lanes=lanes,
        n_elements=head.n_elements,
        int_bits=head.int_bits,
        degree=head.degree,
        idx_list=head.idx_list,
    )
