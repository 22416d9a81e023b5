"""Pallas fused FLASHE kernels: mask generation + application in VMEM.

The XLA path (flashe_tpu/crypto/flashe.py) materializes full mask streams
in HBM before applying them.  This kernel fuses the whole encrypt (or
aggregate-decrypt) per lane tile: the grid walks 32-block-aligned tiles of
the lane vector, each program generates its tile's bitsliced AES counter
masks (begin_block = tile offset — the same counter-offset trick as the
mesh shards) directly in VMEM and applies them to the quantized lanes
without ever writing masks to HBM.  Double masking needs two streams per
tile, so arithmetic intensity per output byte doubles versus one stream —
exactly the case where fusion pays.

int_bits <= 32 single-limb lanes (the production FLASHE configs).

STATUS: bit-exact and tested in interpreter mode (tests/test_pallas_flashe.py).
The current Mosaic TPU lowering rejects the un-bitslicing interleave
("infer-vector-layout: unsupported shape cast" on the (ngroups, 32) ->
flat reshape of the transpose network), so the production TPU path remains
the fused-by-XLA implementation in flashe_tpu/crypto/flashe.py — which
already runs the same bitsliced program.  Revisit when Mosaic supports
minor-dim interleaves, or restructure the round to keep ciphertexts in a
kernel-native permuted lane order end-to-end (mod-add commutes with any
fixed lane permutation, so aggregation/decryption could stay permuted and
only the model unflatten would pay one relayout).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashe_tpu.ops.aes_bitsliced import bitsliced_prp_lane_stream
from flashe_tpu.ops.masks import merge_size

__all__ = ["pallas_mask_apply", "pallas_encrypt", "pallas_decrypt",
           "tile_lanes_for"]

_GROUPS_PER_TILE = 512  # 512 groups = 16384 blocks/tile; state ~0.5MB VMEM


def tile_lanes_for(int_bits: int) -> int:
    return 32 * _GROUPS_PER_TILE * merge_size(int_bits)


def _round_up(n, m):
    return -(-n // m) * m


def _kernel(q_ref, it_ref, add_idx_ref, minus_idx_ref, rk_ref, out_ref,
            *, int_bits: int, tile_lanes: int):
    pid = pl.program_id(0)
    begin_block = pid * (tile_lanes // merge_size(int_bits))
    it = it_ref[0]
    rk = rk_ref[:]
    add = bitsliced_prp_lane_stream(
        rk, it, add_idx_ref[0], tile_lanes, int_bits,
        begin_block=begin_block, assume_aligned=True)
    minus = bitsliced_prp_lane_stream(
        rk, it, minus_idx_ref[0], tile_lanes, int_bits,
        begin_block=begin_block, assume_aligned=True)
    m = np.uint32((1 << int_bits) - 1) if int_bits < 32 else np.uint32(
        0xFFFFFFFF)
    q = q_ref[0].reshape(tile_lanes)
    out_ref[0] = ((q + add - minus) & m).reshape(q_ref.shape[1:])


@functools.lru_cache(maxsize=None)
def _build(count: int, int_bits: int, interpret: bool):
    tile = tile_lanes_for(int_bits)
    padded = _round_up(count, tile)
    n_tiles = padded // tile
    # (8, tile/8) trailing tile shape satisfies the TPU (8, 128) alignment
    rows, cols = 8, tile // 8
    assert cols % 128 == 0

    kern = functools.partial(_kernel, int_bits=int_bits, tile_lanes=tile)
    call = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, rows, cols), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # iter scalar
            pl.BlockSpec(memory_space=pltpu.SMEM),  # add idx
            pl.BlockSpec(memory_space=pltpu.SMEM),  # minus idx
            pl.BlockSpec(memory_space=pltpu.VMEM),  # round keys
        ],
        out_specs=pl.BlockSpec((1, rows, cols), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, rows, cols), jnp.uint32),
        interpret=interpret,
    )

    def run(q, it, add_idx, minus_idx, rk):
        qp = jnp.zeros((padded,), jnp.uint32).at[:count].set(q)
        out = call(
            qp.reshape(n_tiles, rows, cols),
            jnp.asarray([it], jnp.int32),
            jnp.asarray([add_idx], jnp.int32),
            jnp.asarray([minus_idx], jnp.int32),
            jnp.asarray(rk, jnp.int32),
        )
        return out.reshape(padded)[:count]

    return jax.jit(run)


def pallas_mask_apply(q, rk, iter_index, add_idx, minus_idx, int_bits: int,
                      interpret: bool = False):
    """(q + stream(add_idx) - stream(minus_idx)) mod 2^int_bits, fused."""
    count = int(q.shape[0])
    return _build(count, int_bits, interpret)(q, iter_index, add_idx,
                                              minus_idx, rk)


def pallas_encrypt(q, rk, iter_index, client_idx, int_bits: int,
                   interpret: bool = False):
    """FLASHE double-mask encrypt (jzf_flashe.py:480-481), fully fused."""
    return pallas_mask_apply(q, rk, iter_index, client_idx, client_idx + 1,
                             int_bits, interpret)


def pallas_decrypt(agg, rk, iter_index, num_clients, int_bits: int,
                   interpret: bool = False):
    """Boundary-mask decrypt of an aggregate (add idx=n, minus idx=0)."""
    return pallas_mask_apply(agg, rk, iter_index, num_clients, 0, int_bits,
                             interpret)
