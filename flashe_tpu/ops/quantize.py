"""Quantization codec kernels (reference jzf_quantize.py active path).

The reference's live configuration is *padding + asymmetric*
(jzf_quantize.py:55-67, 102-107; the symmetric paths are dead code).  For a
layer clipped at +-alpha with element_bits = eb:

    q  = floor( (clip(x, -a, a) + a) * (2^eb - 1) / (2a) + U[0,1) )
    x' = q_sum * 2*(a*n) / ((2^eb - 1) * n) - a*n      # after summing n clients

Stochastic rounding uses a seeded threefry key (the reference calls
np.random.random unseeded — jzf_quantize.py:64 — so cipher-level, not
quantizer-level, bit-exactness is the contract; see SURVEY.md section 7.3).

Batching mode (`batch=True`) packs `int_bits // (eb + factor)` quantized
elements into one int_bits-bit lane, element 0 most significant
(jzf_quantize.py:162-185), with factor = ceil(log2(num_clients)) padding
bits per element so client sums never carry across fields.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from flashe_tpu.ops.lanes import nlimbs_for

__all__ = [
    "quantize_asym",
    "unquantize_asym",
    "batch_lanes",
    "unbatch_lanes",
    "two_to_true",
    "true_to_two",
]


def quantize_asym(x, alpha, element_bits: int, key) -> jnp.ndarray:
    """Clip/offset/scale/stochastic-round -> uint32 in [0, 2^eb - 1]."""
    a = jnp.float32(alpha)
    x = jnp.clip(x.astype(jnp.float32), -a, a) + a
    x = x * ((np.float32((1 << element_bits) - 1)) / (2.0 * a))
    u = jax.random.uniform(key, x.shape, dtype=jnp.float32)
    return jnp.floor(x + u).astype(jnp.uint32)


def unquantize_asym(q, alpha, element_bits: int, num_clients: int):
    """Inverse after an n-client sum (jzf_quantize.py:102-107)."""
    a = jnp.float32(alpha) * num_clients
    scale = (2.0 * a) / (np.float32((1 << element_bits) - 1) * num_clients)
    return q.astype(jnp.float32) * scale - a


def true_to_two(v, int_bits: int):
    """Two's complement encode: v mod 2^b (jzf_twocomplement.py:8-12)."""
    return jnp.mod(v, 1 << int_bits)


def two_to_true(v, int_bits: int):
    """Two's complement decode (jzf_twocomplement.py:14-19)."""
    border = 1 << (int_bits - 1)
    return jnp.where(v < border, v, v - (1 << int_bits))


def _field_layout(int_bits: int, element_bits: int, factor: int):
    ebf = element_bits + factor
    if ebf > 32:
        raise ValueError("per-element field wider than 32 bits unsupported")
    bs = int_bits // ebf
    if bs < 1:
        raise ValueError("int_bits too small for element_bits + factor")
    return ebf, bs


def batch_lanes(q: jnp.ndarray, int_bits: int, element_bits: int, factor: int):
    """Pack quantized values into int_bits-bit lanes.

    q: (n,) uint32 values < 2^(eb+factor).  Returns (nlanes,) uint32 when
    int_bits <= 32, else (nlanes, L) uint32 limbs (little-endian).  Field j
    of a lane sits at bit offset (bs-1-j)*(eb+factor) — element 0 most
    significant, matching jzf_quantize.py:176-181.
    """
    ebf, bs = _field_layout(int_bits, element_bits, factor)
    n = q.shape[0]
    nlanes = -(-n // bs)
    qp = jnp.zeros((nlanes * bs,), jnp.uint32).at[:n].set(q.astype(jnp.uint32))
    qp = qp.reshape(nlanes, bs)
    nl = nlimbs_for(int_bits)
    limbs = [jnp.zeros((nlanes,), jnp.uint32) for _ in range(nl)]
    for j in range(bs):
        off = (bs - 1 - j) * ebf
        wi, sh = off >> 5, off & 31
        v = qp[:, j]
        limbs[wi] = limbs[wi] | (v << sh)
        if sh + ebf > 32 and wi + 1 < nl:
            limbs[wi + 1] = limbs[wi + 1] | (v >> (32 - sh))
    if nl == 1:
        return limbs[0]
    return jnp.stack(limbs, axis=-1)


def unbatch_lanes(lanes: jnp.ndarray, n: int, int_bits: int, element_bits: int,
                  factor: int):
    """Inverse of batch_lanes; returns (n,) uint32 field values mod 2^ebf
    (jzf_quantize.py:234-251)."""
    ebf, bs = _field_layout(int_bits, element_bits, factor)
    nl = nlimbs_for(int_bits)
    if nl == 1:
        lanes = lanes[:, None]
    nlanes = lanes.shape[0]
    fmask = jnp.uint32((1 << ebf) - 1) if ebf < 32 else jnp.uint32(0xFFFFFFFF)
    cols = []
    for j in range(bs):
        off = (bs - 1 - j) * ebf
        wi, sh = off >> 5, off & 31
        v = lanes[:, wi] >> sh
        if sh + ebf > 32 and wi + 1 < nl:
            v = v | (lanes[:, wi + 1] << (32 - sh))
        cols.append(v & fmask)
    out = jnp.stack(cols, axis=-1).reshape(nlanes * bs)
    return out[:n]


def batch_lanes_np(q: np.ndarray, int_bits: int, element_bits: int,
                   factor: int) -> np.ndarray:
    """Host (numpy) twin of batch_lanes — same layout, bit for bit.

    Exists for host-driven codecs (e.g. the Paillier wire path feeding
    python big-ints): on a network-attached accelerator the device round
    trip costs more than the packing (tests pin equality with the jnp
    path)."""
    ebf, bs = _field_layout(int_bits, element_bits, factor)
    q = np.asarray(q, np.uint32)
    n = q.shape[0]
    nlanes = -(-n // bs)
    qp = np.zeros((nlanes * bs,), np.uint32)
    qp[:n] = q
    qp = qp.reshape(nlanes, bs)
    nl = nlimbs_for(int_bits)
    limbs = [np.zeros((nlanes,), np.uint32) for _ in range(nl)]
    for j in range(bs):
        off = (bs - 1 - j) * ebf
        wi, sh = off >> 5, off & 31
        v = qp[:, j]
        limbs[wi] = limbs[wi] | (v << np.uint32(sh))
        if sh + ebf > 32 and wi + 1 < nl:
            limbs[wi + 1] = limbs[wi + 1] | (v >> np.uint32(32 - sh))
    if nl == 1:
        return limbs[0]
    return np.stack(limbs, axis=-1)


def unbatch_lanes_np(lanes: np.ndarray, n: int, int_bits: int,
                     element_bits: int, factor: int) -> np.ndarray:
    """Host (numpy) twin of unbatch_lanes (see batch_lanes_np)."""
    ebf, bs = _field_layout(int_bits, element_bits, factor)
    nl = nlimbs_for(int_bits)
    lanes = np.asarray(lanes, np.uint32)
    if nl == 1:
        lanes = lanes[:, None]
    nlanes = lanes.shape[0]
    fmask = np.uint32((1 << ebf) - 1) if ebf < 32 else np.uint32(0xFFFFFFFF)
    cols = []
    for j in range(bs):
        off = (bs - 1 - j) * ebf
        wi, sh = off >> 5, off & 31
        v = lanes[:, wi] >> np.uint32(sh)
        if sh + ebf > 32 and wi + 1 < nl:
            v = v | (lanes[:, wi + 1] << np.uint32(32 - sh))
        cols.append(v & fmask)
    out = np.stack(cols, axis=-1).reshape(nlanes * bs)
    return out[:n]
