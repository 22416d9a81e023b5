"""Mod-2^m lane arithmetic on uint32 limb arrays.

The reference stores quantized/masked values as python big ints in
object-dtype numpy arrays and reduces with `(x + y) % 2**int_bits`
(jzf_flashe.py:480-481, jzf_aggregator.py:424-430).  Here a ciphertext is a
fixed-width uint32 array: one lane per element for int_bits <= 32, else
little-endian limb vectors of shape (..., L).  All ops are elementwise VPU
code that XLA fuses with the AES mask generation.

Note on exactness: the reference's *compressed* aggregation path sums
whole-model big integers, letting carries ripple across lane boundaries
into neighbouring lanes (error <= num_clients-1 quanta per lane, absorbed
by the padding bits — see SURVEY.md section 7.3).  Lane-wise masked adds are
carry-exact, i.e. strictly more accurate; tests assert both the lane-wise
identity and the bounded deviation of the reference path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "nlimbs_for",
    "lane_mask",
    "lane_add",
    "lane_sub",
    "lanes_to_ints",
    "ints_to_lanes",
]


def nlimbs_for(int_bits: int) -> int:
    return (int_bits + 31) // 32


def lane_mask(int_bits: int) -> jnp.ndarray:
    """Per-limb AND mask; shape (L,) uint32 (scalar for L == 1 callers)."""
    nl = nlimbs_for(int_bits)
    top_bits = int_bits - 32 * (nl - 1)
    top = (1 << top_bits) - 1 if top_bits < 32 else 0xFFFFFFFF
    # numpy (not device) array: inlined as a literal when traced, avoiding
    # hoisted-constant executables in the runtime's dispatch path
    return np.asarray([0xFFFFFFFF] * (nl - 1) + [top], dtype=np.uint32)


def _is_multi(x: jnp.ndarray, int_bits: int) -> bool:
    return nlimbs_for(int_bits) > 1


def lane_add(a: jnp.ndarray, b: jnp.ndarray, int_bits: int) -> jnp.ndarray:
    """(a + b) mod 2^int_bits, elementwise over lanes."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    nl = nlimbs_for(int_bits)
    if nl == 1:
        m = np.uint32((1 << int_bits) - 1) if int_bits < 32 else np.uint32(
            0xFFFFFFFF
        )
        return (a + b) & m
    # little-endian limb add with carry propagation
    out = []
    carry = jnp.zeros(a.shape[:-1], jnp.uint32)
    for l in range(nl):
        t = a[..., l] + b[..., l]
        c1 = (t < a[..., l]).astype(jnp.uint32)
        s = t + carry
        c2 = (s < t).astype(jnp.uint32)
        out.append(s)
        carry = c1 | c2
    res = jnp.stack(out, axis=-1)
    return res & lane_mask(int_bits)


def lane_sub(a: jnp.ndarray, b: jnp.ndarray, int_bits: int) -> jnp.ndarray:
    """(a - b) mod 2^int_bits, elementwise over lanes."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    nl = nlimbs_for(int_bits)
    if nl == 1:
        m = np.uint32((1 << int_bits) - 1) if int_bits < 32 else np.uint32(
            0xFFFFFFFF
        )
        return (a - b) & m
    out = []
    borrow = jnp.zeros(a.shape[:-1], jnp.uint32)
    for l in range(nl):
        t = a[..., l] - b[..., l]
        b1 = (a[..., l] < b[..., l]).astype(jnp.uint32)
        s = t - borrow
        b2 = (t < borrow).astype(jnp.uint32)
        out.append(s)
        borrow = b1 | b2
    res = jnp.stack(out, axis=-1)
    return res & lane_mask(int_bits)


# ---------------------------------------------------------------------------
# Host-side conversions to/from python big ints (tests, wire compat)
# ---------------------------------------------------------------------------

def lanes_to_ints(lanes: np.ndarray, int_bits: int) -> np.ndarray:
    """uint32 lane/limb array -> object-dtype python ints (host side)."""
    lanes = np.asarray(lanes)
    if nlimbs_for(int_bits) == 1:
        return lanes.astype(object)
    out = np.zeros(lanes.shape[:-1], dtype=object)
    for l in range(lanes.shape[-1]):
        out |= lanes[..., l].astype(object) << (32 * l)
    return out


def ints_to_lanes(ints: np.ndarray, int_bits: int) -> np.ndarray:
    """object-dtype python ints -> uint32 lane/limb array (host side)."""
    ints = np.asarray(ints, dtype=object)
    nl = nlimbs_for(int_bits)
    if nl == 1:
        return np.array([int(v) & 0xFFFFFFFF for v in ints.ravel()],
                        dtype=np.uint32).reshape(ints.shape)
    out = np.zeros(ints.shape + (nl,), dtype=np.uint32)
    flat = ints.ravel()
    oflat = out.reshape(-1, nl)
    for i, v in enumerate(flat):
        v = int(v)
        for l in range(nl):
            oflat[i, l] = (v >> (32 * l)) & 0xFFFFFFFF
    return out
