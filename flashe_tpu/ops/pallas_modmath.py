"""Pallas CIOS Montgomery multiply: the Paillier-2048 hot kernel.

The XLA mont_mul (flashe_tpu/ops/modmath.py:170-205) runs its L CIOS
steps as separate device ops, so the (B, L+2) lazy accumulator plus the
p/q partial products round-trip HBM every step — ~10 MB x 256 steps per
batch-2048 multiply, which makes the 2048-bit modexp HBM-bound (~136
ct/s measured, 0.24x the reference CPU).  This kernel runs the whole
CIOS loop per batch tile with the accumulator resident in VMEM: HBM
traffic drops to one read of a/b and one write of the result per
multiply, turning the kernel compute-bound on the VPU.

Mosaic constraints shape the implementation:
- no dynamic_slice / scatter lowering -> the kernel works in a
  TRANSPOSED (limb-row, batch-col) layout, so the per-step read of limb
  a_i is a dynamic *sublane row* load (supported), every accumulator
  update is a row-concat pad-and-add, and broadcasting a_i over b is a
  plain (1, bt) x (L, bt) elementwise multiply;
- no associative_scan (its recursion emits zero-size slices) -> carries
  resolve with an explicit Kogge-Stone doubling loop over rows;
- the >= n test for the final conditional subtract reuses the
  subtraction itself: low + (R - n) overflows the top limb iff
  low >= n, so the Kogge-Stone pass also returns its carry-out row.

Same math, bit-for-bit, as modmath.mont_mul (pinned in
tests/test_modmath_paillier.py::test_pallas_mont_mul_matches_xla):
16-bit limbs, lazy uint32 accumulators, one conditional subtract of n.

Used automatically by modmath.mont_mul on TPU for batches >= 8.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_mont_mul", "pallas_mont_mul_vec"]

_BASE_BITS = 16
_BASE = 1 << _BASE_BITS
_BMASK = np.uint32(_BASE - 1)


def _batch_tile(L: int) -> int:
    # (L+2, bt) live arrays; bt = 128 keeps the rolled loop's footprint
    # ~10 * 132 KB at L = 256 — comfortable in the 16 MB VMEM budget
    return 128


def _resolve_carries(s, with_carry_out: bool = False):
    """Digits < 2*BASE -> digits < BASE, along axis 0 (limb rows).

    Explicit Kogge-Stone doubling loop (g/p recurrence as in
    modmath._resolve_carries); optionally also returns the carry OUT of
    the top limb row (the inclusive prefix G at the last row)."""
    n = s.shape[0]
    G = (s >= _BASE).astype(jnp.uint32)
    P = (s == _BMASK).astype(jnp.uint32)
    d = 1
    while d < n:
        z = jnp.zeros((d,) + s.shape[1:], jnp.uint32)
        Gs = jnp.concatenate([z, G[:-d]], axis=0)
        Ps = jnp.concatenate([z, P[:-d]], axis=0)
        G = G | (P & Gs)
        P = P & Ps
        d <<= 1
    z1 = jnp.zeros((1,) + s.shape[1:], jnp.uint32)
    out = (s + jnp.concatenate([z1, G[:-1]], axis=0)) & _BMASK
    if with_carry_out:
        return out, G[-1:]
    return out


def _kernel(a_ref, b_ref, n_ref, out_ref, *, L: int, n_prime: int,
            bt: int):
    # transposed layout: rows = limbs, cols = batch
    b = b_ref[0]              # (L, bt)
    nl = n_ref[:]             # (L, 1)
    npr = jnp.uint32(n_prime)
    zrow = jnp.zeros((1, bt), jnp.uint32)
    z2 = jnp.zeros((2, bt), jnp.uint32)

    def body(i, t):
        ai = a_ref[0, pl.dslice(i, 1), :]                       # (1, bt)
        p = ai * b                                              # (L, bt)
        t = (t + jnp.concatenate([p & _BMASK, z2], axis=0)
               + jnp.concatenate([zrow, p >> _BASE_BITS, zrow], axis=0))
        m = ((t[0:1] & _BMASK) * npr) & _BMASK                  # (1, bt)
        q = m * nl                                              # (L, bt)
        t = (t + jnp.concatenate([q & _BMASK, z2], axis=0)
               + jnp.concatenate([zrow, q >> _BASE_BITS, zrow], axis=0))
        carry0 = t[0:1] >> _BASE_BITS
        # shift one limb row down; fold the retired limb's carry in
        return jnp.concatenate([t[1:2] + carry0, t[2:], zrow], axis=0)

    t = jax.lax.fori_loop(
        0, L, body, jnp.zeros((L + 2, bt), jnp.uint32))

    # normalize lazy accumulators (< 2^27) -> digits < BASE
    lo = t & _BMASK
    hi = t >> _BASE_BITS
    hi_shifted = jnp.concatenate([zrow, hi[:-1]], axis=0)
    s = lo + hi_shifted
    lo2 = s & _BMASK
    hi2 = s >> _BASE_BITS
    hi2_shifted = jnp.concatenate([zrow, hi2[:-1]], axis=0)
    tn = _resolve_carries(lo2 + hi2_shifted)

    # conditional subtract of n: low + (R - n) carries out of the top
    # limb iff low >= n (R - n == complement + 1)
    low = tn[:L]
    comp = _BMASK - jnp.broadcast_to(nl, (L, bt))
    one0 = jnp.concatenate(
        [jnp.ones((1, bt), jnp.uint32),
         jnp.zeros((L - 1, bt), jnp.uint32)], axis=0)
    sub, carry_out = _resolve_carries(low + comp + one0,
                                      with_carry_out=True)
    need = (tn[L : L + 1] > 0) | (carry_out > 0)   # (1, bt)
    out_ref[0] = jnp.where(need, sub, low)


@functools.lru_cache(maxsize=None)
def _build(B: int, L: int, n_prime: int, interpret: bool):
    bt = _batch_tile(L)
    padded = -(-B // bt) * bt
    n_tiles = padded // bt
    kern = functools.partial(_kernel, L=L, n_prime=n_prime, bt=bt)
    blk = (1, L, bt)

    def run(a, b, n_limbs):
        if padded != B:
            pad = ((0, padded - B), (0, 0))
            a = jnp.pad(a, pad)
            b = jnp.pad(b, pad)
        # (B, L) -> per-tile transposed (n_tiles, L, bt)
        a3 = a.reshape(n_tiles, bt, L).transpose(0, 2, 1)
        b3 = b.reshape(n_tiles, bt, L).transpose(0, 2, 1)
        out = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(blk, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # n limbs (L, 1)
            ],
            out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, L, bt), jnp.uint32),
            interpret=interpret,
        )(a3, b3, n_limbs[:, None])
        return out.transpose(0, 2, 1).reshape(padded, L)[:B]

    return jax.jit(run)


def pallas_mont_mul(ctx, a, b, interpret: bool = False):
    """Montgomery product a*b*R^-1 mod n, VMEM-resident CIOS.

    ctx: modmath.MontCtx.  a, b: (B, L) normalized uint32 limbs < n.
    """
    B, L = a.shape
    return _build(B, L, ctx.n_prime, interpret)(a, b, ctx.n_limbs)


def _kernel_vec(a_ref, b_ref, n_ref, npr_ref, out_ref, *, L: int, bt: int):
    """Per-COLUMN modulus variant of _kernel: n arrives as an (L, bt)
    tile and n' as a (1, bt) row, so every batch column can reduce by its
    own modulus — the CRT-decrypt merge runs the p^2 and q^2 exponent
    chains as one batch (half the sequential depth of two chains)."""
    b = b_ref[0]              # (L, bt)
    nl = n_ref[0]             # (L, bt)
    npr = npr_ref[0]          # (1, bt)
    zrow = jnp.zeros((1, bt), jnp.uint32)
    z2 = jnp.zeros((2, bt), jnp.uint32)

    def body(i, t):
        ai = a_ref[0, pl.dslice(i, 1), :]                       # (1, bt)
        p = ai * b                                              # (L, bt)
        t = (t + jnp.concatenate([p & _BMASK, z2], axis=0)
               + jnp.concatenate([zrow, p >> _BASE_BITS, zrow], axis=0))
        m = ((t[0:1] & _BMASK) * npr) & _BMASK                  # (1, bt)
        q = m * nl                                              # (L, bt)
        t = (t + jnp.concatenate([q & _BMASK, z2], axis=0)
               + jnp.concatenate([zrow, q >> _BASE_BITS, zrow], axis=0))
        carry0 = t[0:1] >> _BASE_BITS
        return jnp.concatenate([t[1:2] + carry0, t[2:], zrow], axis=0)

    t = jax.lax.fori_loop(
        0, L, body, jnp.zeros((L + 2, bt), jnp.uint32))

    lo = t & _BMASK
    hi = t >> _BASE_BITS
    hi_shifted = jnp.concatenate([zrow, hi[:-1]], axis=0)
    s = lo + hi_shifted
    lo2 = s & _BMASK
    hi2 = s >> _BASE_BITS
    hi2_shifted = jnp.concatenate([zrow, hi2[:-1]], axis=0)
    tn = _resolve_carries(lo2 + hi2_shifted)

    low = tn[:L]
    comp = _BMASK - nl
    one0 = jnp.concatenate(
        [jnp.ones((1, bt), jnp.uint32),
         jnp.zeros((L - 1, bt), jnp.uint32)], axis=0)
    sub, carry_out = _resolve_carries(low + comp + one0,
                                      with_carry_out=True)
    need = (tn[L : L + 1] > 0) | (carry_out > 0)   # (1, bt)
    out_ref[0] = jnp.where(need, sub, low)


@functools.lru_cache(maxsize=None)
def _build_vec(B: int, L: int, interpret: bool):
    bt = _batch_tile(L)
    padded = -(-B // bt) * bt
    n_tiles = padded // bt
    kern = functools.partial(_kernel_vec, L=L, bt=bt)
    blk = (1, L, bt)

    def run(a, b, n_rows, npr_rows):
        if padded != B:
            pad = ((0, padded - B), (0, 0))
            a = jnp.pad(a, pad)
            b = jnp.pad(b, pad)
            n_rows = jnp.pad(n_rows, pad)
            npr_rows = jnp.pad(npr_rows, ((0, padded - B),))
        a3 = a.reshape(n_tiles, bt, L).transpose(0, 2, 1)
        b3 = b.reshape(n_tiles, bt, L).transpose(0, 2, 1)
        n3 = n_rows.reshape(n_tiles, bt, L).transpose(0, 2, 1)
        npr3 = npr_rows.reshape(n_tiles, 1, bt)
        out = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(blk, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bt), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, L, bt), jnp.uint32),
            interpret=interpret,
        )(a3, b3, n3, npr3)
        return out.transpose(0, 2, 1).reshape(padded, L)[:B]

    return jax.jit(run)


def pallas_mont_mul_vec(a, b, n_rows, npr_rows, interpret: bool = False):
    """Montgomery product with a per-row modulus.

    a, b, n_rows: (B, L) uint32 limbs (each row's values < its modulus);
    npr_rows: (B,) uint32 per-row -n^-1 mod 2^16.
    """
    B, L = a.shape
    return _build_vec(B, L, interpret)(a, b, n_rows, npr_rows)


# ---------------------------------------------------------------------------
# fused windowed modexp: the whole exponent scan in ONE kernel
# ---------------------------------------------------------------------------

def _cios_val(aa, bb, nl, npr, *, L: int, bt: int):
    """Montgomery CIOS where BOTH operands are VMEM values (per-column
    modulus).  The per-step limb read of `aa` becomes a static row-0 read
    plus a one-row rotation (dynamic slicing of values cannot lower).
    Returns the normalized (L, bt) product < n."""
    zrow = jnp.zeros((1, bt), jnp.uint32)
    z2 = jnp.zeros((2, bt), jnp.uint32)

    def body(i, carry):
        av, t = carry
        ai = av[0:1]
        av = jnp.concatenate([av[1:], ai], axis=0)
        p = ai * bb
        t = (t + jnp.concatenate([p & _BMASK, z2], axis=0)
               + jnp.concatenate([zrow, p >> _BASE_BITS, zrow], axis=0))
        m = ((t[0:1] & _BMASK) * npr) & _BMASK
        q = m * nl
        t = (t + jnp.concatenate([q & _BMASK, z2], axis=0)
               + jnp.concatenate([zrow, q >> _BASE_BITS, zrow], axis=0))
        carry0 = t[0:1] >> _BASE_BITS
        t = jnp.concatenate([t[1:2] + carry0, t[2:], zrow], axis=0)
        return (av, t)

    _, t = jax.lax.fori_loop(
        0, L, body, (aa, jnp.zeros((L + 2, bt), jnp.uint32)))

    lo = t & _BMASK
    hi = t >> _BASE_BITS
    s = lo + jnp.concatenate([zrow, hi[:-1]], axis=0)
    lo2 = s & _BMASK
    hi2 = s >> _BASE_BITS
    tn = _resolve_carries(
        lo2 + jnp.concatenate([zrow, hi2[:-1]], axis=0))
    low = tn[:L]
    comp = _BMASK - nl
    one0 = jnp.concatenate(
        [jnp.ones((1, bt), jnp.uint32),
         jnp.zeros((L - 1, bt), jnp.uint32)], axis=0)
    sub, carry_out = _resolve_carries(low + comp + one0,
                                      with_carry_out=True)
    need = (tn[L : L + 1] > 0) | (carry_out > 0)
    return jnp.where(need, sub, low)


def _kernel_exp(dig_ref, a_ref, n_ref, npr_ref, r2_ref, one_ref, out_ref,
                *, L: int, bt: int, w: int, ndig: int):
    """Whole fixed-window modexp per batch tile, VMEM-resident.

    Launching one pallas mont_mul per product pays per-call overhead x
    ~1300 sequential products per exponent — at small batches that
    overhead IS the decrypt time.  This kernel runs the table build and
    the full digit scan in one launch; digits live in SMEM (one row per
    tile, so a tile must be single-modulus — the caller pads each
    modulus's rows to a tile boundary).  Constant-time in the exponent
    value: every digit does w squarings + one one-hot table multiply.
    """
    pid = pl.program_id(0)
    nl = n_ref[0]
    npr = npr_ref[0]
    one = one_ref[0]
    base = _cios_val(a_ref[0], r2_ref[0], nl, npr, L=L, bt=bt)  # to mont

    tbl = [one]
    for _ in range((1 << w) - 1):
        tbl.append(_cios_val(tbl[-1], base, nl, npr, L=L, bt=bt))
    tbl_s = jnp.stack(tbl)  # (2^w, L, bt)

    def step(s, acc):
        for _ in range(w):
            acc = _cios_val(acc, acc, nl, npr, L=L, bt=bt)
        d = dig_ref[pid, s]
        sel = jnp.zeros((L, bt), jnp.uint32)
        for ti in range(1 << w):
            sel = jnp.where(d == ti, tbl_s[ti], sel)
        return _cios_val(acc, sel, nl, npr, L=L, bt=bt)

    acc = jax.lax.fori_loop(0, ndig, step, one)
    lone = jnp.concatenate(
        [jnp.ones((1, bt), jnp.uint32),
         jnp.zeros((L - 1, bt), jnp.uint32)], axis=0)
    out_ref[0] = _cios_val(acc, lone, nl, npr, L=L, bt=bt)  # from mont


@functools.lru_cache(maxsize=None)
def _build_exp(n_tiles: int, L: int, w: int, ndig: int, interpret: bool):
    bt = _batch_tile(L)
    kern = functools.partial(_kernel_exp, L=L, bt=bt, w=w, ndig=ndig)
    blk = (1, L, bt)

    def run(a3, n3, npr3, r23, one3, digs):
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                # whole digit table in SMEM; the kernel row-indexes by
                # program id (blocked SMEM specs demand (8,128)-divisible
                # blocks, which a (1, ndig) row is not)
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(blk, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bt), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, L, bt), jnp.uint32),
            interpret=interpret,
        )(digs, a3, n3, npr3, r23, one3)

    return jax.jit(run)


def _to_tiles(x, n_tiles, bt, L):
    return x.reshape(n_tiles, bt, L).transpose(0, 2, 1)


def pallas_mont_exp_tiles(a, n_rows, npr_rows, r2_rows, one_rows,
                          tile_digits, w: int = 4,
                          interpret: bool = False):
    """Fused windowed modexp over tile-aligned rows.

    a, n_rows, r2_rows, one_rows: (B, L) with B a multiple of the batch
    tile; npr_rows: (B,); tile_digits: (B // bt, ndig) int32 MSB-first
    base-2^w digits, one row per tile (all rows of a tile share a
    modulus AND an exponent).  Returns a^e mod n, plain domain (r2/one
    rows carry the per-modulus Montgomery constants).
    """
    B, L = a.shape
    bt = _batch_tile(L)
    assert B % bt == 0, "pad rows to the batch tile"
    n_tiles = B // bt
    ndig = tile_digits.shape[1]
    a3 = _to_tiles(a, n_tiles, bt, L)
    n3 = _to_tiles(n_rows, n_tiles, bt, L)
    npr3 = npr_rows.reshape(n_tiles, 1, bt)
    r23 = _to_tiles(r2_rows, n_tiles, bt, L)
    one3 = _to_tiles(one_rows, n_tiles, bt, L)
    out = _build_exp(n_tiles, L, w, ndig, interpret)(
        a3, n3, npr3, r23, one3, jnp.asarray(tile_digits, jnp.int32))
    return out.transpose(0, 2, 1).reshape(B, L)
