"""Pallas fused FLASHE kernels: mask generation + application in VMEM.

The XLA path (flashe_tpu/crypto/flashe.py) runs the bitsliced AES program
as many separate VPU kernels with HBM round-trips between them.  This
kernel fuses the whole encrypt (or aggregate-decrypt) per lane tile: the
grid walks 32-block-aligned tiles of the lane vector, each program
generates its tile's bitsliced AES counter masks (begin_block = tile
offset — the same counter-offset trick as the mesh shards) directly in
VMEM and applies them to the quantized lanes without ever writing masks
to HBM.  Double masking needs two streams per tile, so arithmetic
intensity per output byte doubles versus one stream — exactly the case
where fusion pays.

Mosaic rejects the minor-dim interleave that converts bit-transposed
words back to linear block order ("infer-vector-layout: unsupported
shape cast" on the (G, 32) -> flat reshape), so the kernel works in the
*permuted* lane layout (merge, 32, G) end to end — mod-add commutes with
any fixed lane permutation — and the host-side wrapper relayouts q in
and ciphertext out with two cheap XLA transposes (~one HBM pass each,
negligible against the AES arithmetic).  Public lane order and
bit-exactness are unchanged.

int_bits <= 32 single-limb lanes (the production FLASHE configs).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashe_tpu.ops.aes_bitsliced import (
    bitsliced_counter_words, bitsliced_counter_words_flat, lanes_permuted,
)
from flashe_tpu.ops.masks import merge_size

__all__ = ["pallas_mask_apply", "pallas_encrypt", "pallas_decrypt",
           "tile_lanes_for"]

# 1024 groups = 32768 blocks/tile.  The AES state is 128 flat planes of
# (8, 128) uint32 — exactly one vreg per plane, so every gate is one
# full-width VPU op (see bitsliced_counter_words_flat); ~4 MB VMEM/tile.
# FLASHE_TILE_GROUPS widens the planes to (G/128, 128) — multiple vregs
# per gate, i.e. independent instructions inside each gate op — the
# issue-pressure experiment documented in docs/ROOFLINE.md §3.
import os as _os

_GROUPS_PER_TILE = int(_os.environ.get("FLASHE_TILE_GROUPS", "1024"))
assert _GROUPS_PER_TILE % 128 == 0
_PL_SUB = _GROUPS_PER_TILE // 128  # plane sublane dim (vregs per gate)

# FLASHE_DUAL_INTERLEAVE=1 evaluates the add and minus AES circuits in
# ONE shared gate schedule (each gate op spans both circuits' planes —
# two independent dependency chains per instruction) instead of two
# sequential circuit evaluations — the remaining ILP experiment of
# docs/ROOFLINE.md §3.
_DUAL_INTERLEAVE = _os.environ.get("FLASHE_DUAL_INTERLEAVE") == "1"


def _groups(interpret: bool) -> int:
    # interpret mode (CPU tests) executes the unrolled AES trace
    # elementwise in python — keep its tiles small; real TPU tiles use
    # the full vreg-aligned size
    return 64 if interpret else _GROUPS_PER_TILE


def tile_lanes_for(int_bits: int, interpret: bool = False) -> int:
    return 32 * _groups(interpret) * merge_size(int_bits)


def _round_up(n, m):
    return -(-n // m) * m


def _kernel(q_ref, it_ref, add_idx_ref, minus_idx_ref, base_ref, rk_ref,
            out_ref, *, int_bits: int, groups: int, flat: bool):
    pid = pl.program_id(0)
    begin_block = base_ref[0] + pid * (groups * 32)
    it = it_ref[0]
    rk = rk_ref[:]

    def stream(idx):
        if flat:
            # TPU fast path: 128 independent (8, cols) planes, one vreg
            # per gate op (see bitsliced_counter_words_flat)
            return bitsliced_counter_words_flat(
                rk, it, idx, groups, begin_block, two_d=True)
        # interpret path (CPU tests): the stacked circuit traces ~16x
        # fewer ops — the flat trace is prohibitive to interpret; the
        # two are pinned bit-identical in tests/test_bitsliced.py
        words = bitsliced_counter_words(rk, it, idx, groups, begin_block)
        return [w.reshape(32, _PL_SUB, groups // _PL_SUB) for w in words]

    if flat and _DUAL_INTERLEAVE:
        wa, wb = bitsliced_counter_words_flat(
            rk, it, add_idx_ref[0], groups, begin_block, two_d=True,
            stream_idx2=minus_idx_ref[0])
        add = lanes_permuted(wa, int_bits)
        minus = lanes_permuted(wb, int_bits)
    else:
        add = lanes_permuted(stream(add_idx_ref[0]), int_bits)
        minus = lanes_permuted(stream(minus_idx_ref[0]), int_bits)
    m = np.uint32((1 << int_bits) - 1) if int_bits < 32 else np.uint32(
        0xFFFFFFFF)
    out_ref[0] = (q_ref[0] + add - minus) & m


@functools.lru_cache(maxsize=None)
def _build(count: int, int_bits: int, interpret: bool):
    merge = merge_size(int_bits)
    groups = _groups(interpret)
    tile = tile_lanes_for(int_bits, interpret)
    padded = _round_up(count, tile)
    n_tiles = padded // tile

    kern = functools.partial(_kernel, int_bits=int_bits, groups=groups,
                             flat=not interpret)

    cols = groups // _PL_SUB
    blk = (1, merge, 32, _PL_SUB, cols)

    def _call(q5, *rest):
        # out varies over exactly the mesh axes the inputs do: propagate
        # vma so the kernel composes with shard_map(check_vma=True)
        # (the mesh-sharded aggregation path, parallel/sharded.py)
        vma = frozenset()
        for x in (q5, *rest):
            vma |= getattr(jax.typeof(x), "vma", frozenset()) or frozenset()
        out_shape = jax.ShapeDtypeStruct(
            (n_tiles, merge, 32, _PL_SUB, cols), jnp.uint32, vma=vma)
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(blk, lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # iter scalar
                pl.BlockSpec(memory_space=pltpu.SMEM),  # add idx
                pl.BlockSpec(memory_space=pltpu.SMEM),  # minus idx
                pl.BlockSpec(memory_space=pltpu.SMEM),  # base block offset
                pl.BlockSpec(memory_space=pltpu.VMEM),  # round keys
            ],
            out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
        )(q5, *rest)

    def run(q, it, add_idx, minus_idx, base_block, rk):
        qp = jnp.zeros((padded,), jnp.uint32).at[:count].set(q)
        # linear lane order (s, lc, j, j0) -> kernel-native (j0, j, s, lc)
        # per tile, where group g = s * cols + lc (the 2-D plane layout)
        q5 = qp.reshape(n_tiles, _PL_SUB, cols, 32, merge).transpose(
            0, 4, 3, 1, 2)
        out5 = _call(
            q5,
            jnp.asarray([it], jnp.int32),
            jnp.asarray([add_idx], jnp.int32),
            jnp.asarray([minus_idx], jnp.int32),
            jnp.asarray([base_block], jnp.int32),
            jnp.asarray(rk, jnp.int32),
        )
        out = out5.transpose(0, 3, 4, 2, 1).reshape(padded)
        return out[:count]

    return jax.jit(run)


def pallas_mask_apply(q, rk, iter_index, add_idx, minus_idx, int_bits: int,
                      base_block=0, interpret: bool = False):
    """(q + stream(add_idx) - stream(minus_idx)) mod 2^int_bits, fused.

    base_block offsets the AES counters (must be 32-aligned) — the same
    counter-offset contract as prp_lane_stream's begin_block, used by the
    mesh shards (flashe_tpu/parallel/sharded.py).
    """
    count = int(q.shape[0])
    return _build(count, int_bits, interpret)(q, iter_index, add_idx,
                                              minus_idx, base_block, rk)


def pallas_encrypt(q, rk, iter_index, client_idx, int_bits: int,
                   base_block=0, interpret: bool = False):
    """FLASHE double-mask encrypt (jzf_flashe.py:480-481), fully fused."""
    return pallas_mask_apply(q, rk, iter_index, client_idx, client_idx + 1,
                             int_bits, base_block, interpret)


def pallas_decrypt(agg, rk, iter_index, num_clients, int_bits: int,
                   base_block=0, interpret: bool = False):
    """Boundary-mask decrypt of an aggregate (add idx=n, minus idx=0)."""
    return pallas_mask_apply(agg, rk, iter_index, num_clients, 0, int_bits,
                             base_block, interpret)
