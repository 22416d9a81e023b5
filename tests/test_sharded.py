"""Mesh-sharded encrypted aggregation on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flashe_tpu.ops import aes
from flashe_tpu.parallel import sharded

SEED = bytes(range(32))


@pytest.mark.slow
def test_encrypted_aggregate_mesh():
    int_bits, n_clients, n_shards = 20, 2, 4
    mesh = sharded.make_mesh(n_clients, n_shards)
    n = sharded.padded_lane_count(1000, int_bits, n_shards)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randint(0, 1 << 16, (n_clients, n)).astype(np.uint32))
    rk = jnp.asarray(aes.key_schedule(SEED).astype(np.int32))

    out = sharded.encrypted_aggregate(mesh, rk, q, jnp.int32(0), int_bits,
                                      n_clients)
    want = np.asarray(q, np.int64).sum(axis=0) % (1 << int_bits)
    np.testing.assert_array_equal(np.asarray(out, np.int64), want)


@pytest.mark.slow
def test_shard_streams_match_protocol_cipher():
    """Mesh encryption must be bit-compatible with the federated path."""
    from flashe_tpu.crypto.flashe import FlasheCipher
    from flashe_tpu.ops.lanes import lane_add

    int_bits, n_clients, n_shards = 20, 2, 4
    mesh = sharded.make_mesh(n_clients, n_shards)
    n = sharded.padded_lane_count(500, int_bits, n_shards)
    rng = np.random.RandomState(1)
    q = rng.randint(0, 1 << 16, (n_clients, n)).astype(np.uint32)
    rk = jnp.asarray(aes.key_schedule(SEED).astype(np.int32))

    mesh_out = np.asarray(sharded.encrypted_aggregate(
        mesh, rk, jnp.asarray(q), jnp.int32(5), int_bits, n_clients))

    # protocol path: FlasheCipher per client, lane-added
    agg = None
    ciphers = []
    for i in range(n_clients):
        c = FlasheCipher(int_bits)
        c.idx = i
        c.set_num_clients(n_clients)
        c.generate_prp_seed(assigned_seed=SEED)
        c.set_iter_index(5)
        ct = c.encrypt(jnp.asarray(q[i]))
        agg = ct if agg is None else lane_add(agg, ct, int_bits)
        ciphers.append(c)
    dec = np.asarray(ciphers[0].decrypt(agg))
    np.testing.assert_array_equal(mesh_out, dec)


@pytest.mark.slow
def test_encrypted_aggregate_mesh_survivors():
    """Dropout on the mesh: non-survivors' ciphertexts are excluded and the
    run-merged survivor boundaries decrypt the partial aggregate, matching
    the federated protocol cipher bit-for-bit (VERDICT r2 item 6)."""
    from flashe_tpu.crypto.flashe import FlasheCipher
    from flashe_tpu.ops.lanes import lane_add

    int_bits, n_clients, n_shards = 20, 4, 2
    survivors = (0, 2, 3)  # client 1 dropped
    mesh = sharded.make_mesh(n_clients, n_shards)
    n = sharded.padded_lane_count(300, int_bits, n_shards)
    rng = np.random.RandomState(9)
    q = rng.randint(0, 1 << 16, (n_clients, n)).astype(np.uint32)
    rk = jnp.asarray(aes.key_schedule(SEED).astype(np.int32))

    mesh_out = np.asarray(sharded.encrypted_aggregate(
        mesh, rk, jnp.asarray(q), jnp.int32(3), int_bits, n_clients,
        survivors=survivors))

    # federated path: only survivors' ciphertexts reach the arbiter;
    # decrypt with the survivor idx list
    agg = None
    cipher = None
    for i in survivors:
        c = FlasheCipher(int_bits)
        c.idx = i
        c.set_num_clients(n_clients)
        c.generate_prp_seed(assigned_seed=SEED)
        c.set_iter_index(3)
        ct = c.encrypt(jnp.asarray(q[i]))
        agg = ct if agg is None else lane_add(agg, ct, int_bits)
        cipher = c
    dec = np.asarray(cipher.decrypt(agg, idx_list=list(survivors)))
    np.testing.assert_array_equal(mesh_out, dec)

    # and the plaintext identity: survivors' mod-2^m sum
    want = np.asarray(q[list(survivors)], np.int64).sum(0) % (1 << int_bits)
    np.testing.assert_array_equal(mesh_out.astype(np.int64), want)
