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
    bitsliced_counter_words, lanes_permuted,
)
from flashe_tpu.ops.masks import merge_size

__all__ = ["pallas_mask_apply", "pallas_encrypt", "pallas_decrypt",
           "tile_lanes_for"]

_GROUPS_PER_TILE = 512  # 512 groups = 16384 blocks/tile; state ~0.5MB VMEM


def tile_lanes_for(int_bits: int) -> int:
    return 32 * _GROUPS_PER_TILE * merge_size(int_bits)


def _round_up(n, m):
    return -(-n // m) * m


def _kernel(q_ref, it_ref, add_idx_ref, minus_idx_ref, base_ref, rk_ref,
            out_ref, *, int_bits: int):
    pid = pl.program_id(0)
    begin_block = base_ref[0] + pid * (_GROUPS_PER_TILE * 32)
    it = it_ref[0]
    rk = rk_ref[:]
    add = lanes_permuted(
        bitsliced_counter_words(rk, it, add_idx_ref[0], _GROUPS_PER_TILE,
                                begin_block), int_bits)
    minus = lanes_permuted(
        bitsliced_counter_words(rk, it, minus_idx_ref[0], _GROUPS_PER_TILE,
                                begin_block), int_bits)
    m = np.uint32((1 << int_bits) - 1) if int_bits < 32 else np.uint32(
        0xFFFFFFFF)
    out_ref[0] = (q_ref[0] + add - minus) & m


@functools.lru_cache(maxsize=None)
def _build(count: int, int_bits: int, interpret: bool):
    merge = merge_size(int_bits)
    tile = tile_lanes_for(int_bits)
    padded = _round_up(count, tile)
    n_tiles = padded // tile

    kern = functools.partial(_kernel, int_bits=int_bits)

    def _call(q4, *rest):
        # out varies over exactly the mesh axes the inputs do: propagate
        # vma so the kernel composes with shard_map(check_vma=True)
        # (the mesh-sharded aggregation path, parallel/sharded.py)
        vma = frozenset()
        for x in (q4, *rest):
            vma |= getattr(jax.typeof(x), "vma", frozenset()) or frozenset()
        out_shape = jax.ShapeDtypeStruct(
            (n_tiles, merge, 32, _GROUPS_PER_TILE), jnp.uint32, vma=vma)
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, merge, 32, _GROUPS_PER_TILE),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # iter scalar
                pl.BlockSpec(memory_space=pltpu.SMEM),  # add idx
                pl.BlockSpec(memory_space=pltpu.SMEM),  # minus idx
                pl.BlockSpec(memory_space=pltpu.SMEM),  # base block offset
                pl.BlockSpec(memory_space=pltpu.VMEM),  # round keys
            ],
            out_specs=pl.BlockSpec((1, merge, 32, _GROUPS_PER_TILE),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
        )(q4, *rest)

    def run(q, it, add_idx, minus_idx, base_block, rk):
        qp = jnp.zeros((padded,), jnp.uint32).at[:count].set(q)
        # linear lane order (g, j, j0) -> kernel-native (j0, j, g) per tile
        q4 = qp.reshape(n_tiles, _GROUPS_PER_TILE, 32, merge).transpose(
            0, 3, 2, 1)
        out4 = _call(
            q4,
            jnp.asarray([it], jnp.int32),
            jnp.asarray([add_idx], jnp.int32),
            jnp.asarray([minus_idx], jnp.int32),
            jnp.asarray([base_block], jnp.int32),
            jnp.asarray(rk, jnp.int32),
        )
        out = out4.transpose(0, 3, 2, 1).reshape(padded)
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
