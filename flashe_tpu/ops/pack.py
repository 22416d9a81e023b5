"""Wire bit-packing: lane arrays <-> byte strings with 1.0x inflation.

The reference concatenates all int_bits-bit elements MSB-first into one
python big int per layer (jzf_weights.py:45-84 `_to_bytes`, used by
`JZFTransferableWeights.compress`), giving ciphertext size == packed
plaintext size — FLASHE's headline property.  Here the identical bitstream
is produced by vectorized numpy bit transposition (host side; the wire is
host territory), with optional acceleration from the native C++ helper
(flashe_tpu/native) when built.

Layout: bits of element i occupy positions [B - (i+1)*int_bits,
B - i*int_bits) of a ceil(B/8)-byte big-endian string, B = n * int_bits —
exactly the byte serialization of the reference's big int.
"""

from __future__ import annotations

import numpy as np

from flashe_tpu.ops.lanes import nlimbs_for

__all__ = ["pack_lanes", "unpack_lanes", "packed_nbytes"]


def packed_nbytes(n: int, int_bits: int) -> int:
    return (n * int_bits + 7) // 8


def _lane_bits_msb_first(lanes: np.ndarray, int_bits: int) -> np.ndarray:
    """(n,) or (n, L) uint32 -> (n, int_bits) uint8 bit matrix, MSB first."""
    lanes = np.asarray(lanes, dtype=np.uint32)
    nl = nlimbs_for(int_bits)
    if nl == 1:
        if lanes.ndim != 1:
            lanes = lanes.reshape(-1)
        shifts = np.arange(int_bits - 1, -1, -1, dtype=np.uint32)
        return ((lanes[:, None] >> shifts) & 1).astype(np.uint8)
    # limb l holds bits [32l, 32(l+1)) counted from the LSB
    n = lanes.shape[0]
    bits = np.empty((n, int_bits), dtype=np.uint8)
    for b in range(int_bits):
        src = int_bits - 1 - b  # bit position from LSB for output column b
        wi, sh = src >> 5, src & 31
        bits[:, b] = (lanes[:, wi] >> np.uint32(sh)) & 1
    return bits


def pack_lanes(lanes: np.ndarray, int_bits: int) -> bytes:
    """Lane array -> big-endian packed bytes (reference big-int layout)."""
    from flashe_tpu import native

    fast = native.pack_lanes(np.asarray(lanes), int_bits)
    if fast is not None:
        return fast
    bits = _lane_bits_msb_first(lanes, int_bits)
    total = bits.size
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([np.zeros(pad, np.uint8), bits.reshape(-1)])
    return np.packbits(bits.reshape(-1)).tobytes()


def unpack_lanes(data: bytes, n: int, int_bits: int) -> np.ndarray:
    """Packed bytes -> (n,) uint32 (or (n, L) limb) lane array."""
    from flashe_tpu import native

    nl0 = nlimbs_for(int_bits)
    fast = native.unpack_lanes(data, n, int_bits, nl0)
    if fast is not None:
        return fast
    total = n * int_bits
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    bits = bits[len(bits) - total :].reshape(n, int_bits)
    nl = nlimbs_for(int_bits)
    if nl == 1:
        shifts = np.arange(int_bits - 1, -1, -1, dtype=np.uint32)
        return (bits.astype(np.uint32) << shifts).sum(
            axis=1, dtype=np.uint32
        )
    lanes = np.zeros((n, nl), dtype=np.uint32)
    for b in range(int_bits):
        src = int_bits - 1 - b
        wi, sh = src >> 5, src & 31
        lanes[:, wi] |= bits[:, b].astype(np.uint32) << np.uint32(sh)
    return lanes


def pack_ints_reference(values, int_bits: int) -> int:
    """Reference-semantics packer: python big int, element 0 most
    significant (mirrors jzf_weights.py:45-84; used by tests as oracle)."""
    s = 0
    for v in values:
        s = (s << int_bits) | int(v)
    return s
