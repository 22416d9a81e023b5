"""Layer-wise top-s% gradient sparsification with residual memory.

Reference jzf_aggregator.py:578-623: per layer, select the
floor(s * size) largest-|delta| positions (selection is by |delta| alone;
the residual is *added to the transmitted value* but does not influence
selection — mirrored faithfully), carry the unselected delta+residual as
residual memory, and ship bit-packed global locations.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from flashe_tpu.nn.weights import WeightsCodec
from flashe_tpu.ops import pack as packops

__all__ = ["Sparsifier", "encode_locations", "decode_locations"]


def encode_locations(locations: np.ndarray, total: int) -> dict:
    """Bit-pack location indices (reference jzf_aggregator.py:616-623)."""
    bits = int(total).bit_length()
    data = packops.pack_lanes(locations.astype(np.uint32), bits)
    return {
        "encoded_masked_locations": data,
        "bits": bits,
        "l": int(len(locations)),
        "total": int(total),
    }


def decode_locations(obj: dict) -> np.ndarray:
    return packops.unpack_lanes(
        obj["encoded_masked_locations"], obj["l"], obj["bits"]
    ).astype(np.int64)


@dataclasses.dataclass
class SparsifyResult:
    values: np.ndarray  # compacted delta+residual at selected positions
    locations: np.ndarray  # global flat indices (sorted)
    total: int


class Sparsifier:
    def __init__(self, codec: WeightsCodec, sparsity: float):
        self.codec = codec
        self.sparsity = sparsity
        self.residual: Optional[np.ndarray] = None

    def sparsify(self, flat_delta: np.ndarray) -> SparsifyResult:
        c = self.codec
        flat_delta = np.asarray(flat_delta, np.float32)
        if self.residual is None:
            self.residual = np.zeros(c.total, np.float32)

        locations = []
        for k in range(c.n_layers):
            b, e = c.offsets[k], c.offsets[k + 1]
            seg = flat_delta[b:e]
            idx = max(1, int(np.floor(self.sparsity * (e - b))))
            sel = np.sort(np.argsort(np.abs(seg))[-idx:])
            locations.append(sel + b)
        locations = np.concatenate(locations)

        carried = flat_delta + self.residual
        values = carried[locations].copy()
        carried[locations] = 0.0
        self.residual = carried
        return SparsifyResult(values=values, locations=locations, total=c.total)
