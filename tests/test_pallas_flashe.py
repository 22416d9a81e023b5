"""Pallas fused FLASHE kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flashe_tpu.ops import aes, masks
from flashe_tpu.ops import pallas_flashe as pf
from flashe_tpu.ops.lanes import lane_add, lane_sub

SEED = bytes(range(32))


@pytest.mark.slow
def test_pallas_encrypt_matches_reference_stream():
    int_bits = 20
    rk = aes.key_schedule(SEED).astype(np.int32)
    count = 3000  # forces padding within one tile
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randint(0, 1 << 16, count).astype(np.uint32))

    got = np.asarray(pf.pallas_encrypt(q, rk, 4, 2, int_bits, interpret=True))

    add = masks.reference_mask_stream_host(SEED, 4, 2, count, int_bits)
    minus = masks.reference_mask_stream_host(SEED, 4, 3, count, int_bits)
    want = (np.asarray(q, dtype=object) + add - minus) % (1 << int_bits)
    np.testing.assert_array_equal(got.astype(object), want)


@pytest.mark.slow
def test_pallas_roundtrip_multi_tile():
    int_bits = 16
    tile = pf.tile_lanes_for(int_bits)
    count = tile + 123  # spans two tiles
    rk = aes.key_schedule(SEED).astype(np.int32)
    rng = np.random.RandomState(1)
    qs = [jnp.asarray(rng.randint(0, 1 << 14, count).astype(np.uint32))
          for _ in range(3)]

    agg = None
    for i, q in enumerate(qs):
        ct = pf.pallas_encrypt(q, rk, 0, i, int_bits, interpret=True)
        agg = ct if agg is None else lane_add(agg, ct, int_bits)
    dec = pf.pallas_decrypt(agg, rk, 0, 3, int_bits, interpret=True)
    want = sum(np.asarray(q, np.int64) for q in qs) % (1 << int_bits)
    np.testing.assert_array_equal(np.asarray(dec, np.int64), want)


@pytest.mark.slow
def test_pallas_base_block_offset_matches_stream():
    """base_block makes the kernel generate the global counter slice —
    the sharded-mesh contract (parallel/sharded.py)."""
    int_bits = 20
    rk = aes.key_schedule(SEED).astype(np.int32)
    merge = masks.merge_size(int_bits)
    shard_lanes = 32 * merge * 4  # 4 groups per shard
    total = 3 * shard_lanes
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randint(0, 1 << 16, total).astype(np.uint32))

    # whole-vector encrypt vs per-shard encrypts with offsets
    whole = np.asarray(
        pf.pallas_encrypt(q, rk, 7, 1, int_bits, interpret=True))
    parts = []
    for s in range(3):
        qs = q[s * shard_lanes:(s + 1) * shard_lanes]
        base = s * (shard_lanes // merge)
        parts.append(np.asarray(pf.pallas_encrypt(
            qs, rk, 7, 1, int_bits, base_block=base, interpret=True)))
    np.testing.assert_array_equal(np.concatenate(parts), whole)
