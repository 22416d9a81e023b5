"""Pallas CIOS Montgomery multiply: the Paillier-2048 hot kernel.

The XLA mont_mul (flashe_tpu/ops/modmath.py:170-205) runs its L CIOS
steps as separate device ops, so the (B, L+2) lazy accumulator plus the
p/q partial products round-trip HBM every step — ~10 MB x 256 steps per
batch-2048 multiply, which makes the 2048-bit modexp HBM-bound (~136
ct/s measured, 0.24x the reference CPU).  This kernel runs the whole
CIOS loop per batch tile with the accumulator resident in VMEM: HBM
traffic drops to one read of a/b and one write of the result per
multiply, turning the kernel compute-bound on the VPU.

Same math, bit-for-bit, as modmath.mont_mul (pinned in
tests/test_modmath_paillier.py::test_pallas_mont_mul_matches_xla):
16-bit limbs, lazy uint32 accumulators, Kogge-Stone carry resolution,
one conditional subtract of n.

Used automatically by modmath.mont_mul on TPU for batches >= 8.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_mont_mul"]

_BASE_BITS = 16
_BASE = 1 << _BASE_BITS
_BMASK = np.uint32(_BASE - 1)

# tile the batch so (Bt, L) stays ~128 KB: full-vreg ops without VMEM
# pressure from the ~6 live (Bt, L) intermediates per CIOS step
def _batch_tile(L: int) -> int:
    return max(8, min(256, 32768 // L * 8))


def _resolve_carries(s):
    g = (s >= _BASE).astype(jnp.uint32)
    p = (s == _BMASK).astype(jnp.uint32)

    def combine(lo, hi):
        g1, p1 = lo
        g2, p2 = hi
        return (g2 | (p2 & g1), p1 & p2)

    G, _ = jax.lax.associative_scan(combine, (g, p), axis=-1)
    carry_in = jnp.concatenate(
        [jnp.zeros_like(G[..., :1]), G[..., :-1]], axis=-1)
    return (s + carry_in) & _BMASK


def _kernel(a_ref, b_ref, n_ref, out_ref, *, L: int, n_prime: int,
            bt: int):
    a = a_ref[0]
    b = b_ref[0]
    n_limbs = n_ref[:]
    npr = jnp.uint32(n_prime)
    t = jnp.zeros((bt, L + 2), jnp.uint32)

    def step(i, t):
        ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=1)  # (bt, 1)
        p = ai * b
        t = t.at[:, :L].add(p & _BMASK)
        t = t.at[:, 1 : L + 1].add(p >> _BASE_BITS)
        m = ((t[:, 0] & _BMASK) * npr) & _BMASK
        q = m[:, None] * n_limbs[None, :]
        t = t.at[:, :L].add(q & _BMASK)
        t = t.at[:, 1 : L + 1].add(q >> _BASE_BITS)
        carry0 = t[:, 0] >> _BASE_BITS
        t = jnp.concatenate(
            [t[:, 1:], jnp.zeros((bt, 1), jnp.uint32)], axis=1)
        t = t.at[:, 0].add(carry0)
        return t

    t = jax.lax.fori_loop(0, L, step, t)

    # normalize lazy accumulators (< 2^27) -> digits < BASE
    lo = t & _BMASK
    hi = t >> _BASE_BITS
    hi_shifted = jnp.concatenate(
        [jnp.zeros_like(hi[:, :1]), hi[:, :-1]], axis=1)
    s = lo + hi_shifted
    lo2 = s & _BMASK
    hi2 = s >> _BASE_BITS
    hi2_shifted = jnp.concatenate(
        [jnp.zeros_like(hi2[:, :1]), hi2[:, :-1]], axis=1)
    tn = _resolve_carries(lo2 + hi2_shifted)

    # conditional subtract of n (T < 2n; see modmath.mont_mul)
    low = tn[:, :L]
    gt = jnp.zeros((bt,), jnp.bool_)
    eq = jnp.ones((bt,), jnp.bool_)
    for j in reversed(range(L)):
        gt = gt | (eq & (low[:, j] > n_limbs[j]))
        eq = eq & (low[:, j] == n_limbs[j])
    need = (tn[:, L] > 0) | gt | eq
    comp = _BMASK - jnp.broadcast_to(n_limbs, low.shape)
    ssum = low + comp
    ssum = ssum.at[:, 0].add(1)
    sub = _resolve_carries(ssum)
    out_ref[0] = jnp.where(need[:, None], sub, low)


@functools.lru_cache(maxsize=None)
def _build(B: int, L: int, n_prime: int, interpret: bool):
    bt = _batch_tile(L)
    padded = -(-B // bt) * bt
    n_tiles = padded // bt
    kern = functools.partial(_kernel, L=L, n_prime=n_prime, bt=bt)
    blk = (1, bt, L)

    def run(a, b, n_limbs):
        if padded != B:
            pad = ((0, padded - B), (0, 0))
            a = jnp.pad(a, pad)
            b = jnp.pad(b, pad)
        a3 = a.reshape(n_tiles, bt, L)
        b3 = b.reshape(n_tiles, bt, L)
        out = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(blk, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # n_limbs
            ],
            out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, bt, L), jnp.uint32),
            interpret=interpret,
        )(a3, b3, n_limbs)
        return out.reshape(padded, L)[:B]

    return jax.jit(run)


def pallas_mont_mul(ctx, a, b, interpret: bool = False):
    """Montgomery product a*b*R^-1 mod n, VMEM-resident CIOS.

    ctx: modmath.MontCtx.  a, b: (B, L) normalized uint32 limbs < n.
    """
    B, L = a.shape
    return _build(B, L, ctx.n_prime, interpret)(a, b, ctx.n_limbs)
