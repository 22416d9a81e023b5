"""Golden-vector tests: device mask streams == reference PRP semantics.

The host oracle `reference_mask_stream_host` replicates
federatedml/secureprotol/jzf_flashe.py:48-82 (N_JOBS=1 canonical chunking)
using the `cryptography` AES — the same primitive PyCryptodome provides in
the reference.  These tests pin the bit-exactness contract of BASELINE.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flashe_tpu.ops import aes, lanes, masks


SEED = bytes(range(11, 43))  # deterministic 32-byte PRP seed


@pytest.mark.parametrize("int_bits", [16, 20, 32])
def test_lane_stream_matches_reference(int_bits):
    rk = aes.key_schedule(SEED)
    count = 53
    got = masks.prp_lane_stream(rk, 3, 2, count, int_bits)
    want = masks.reference_mask_stream_host(SEED, 3, 2, count, int_bits)
    np.testing.assert_array_equal(
        np.asarray(got).astype(object), want
    )


@pytest.mark.parametrize("int_bits", [40, 120, 128])
def test_wide_lane_stream_matches_reference(int_bits):
    rk = aes.key_schedule(SEED)
    count = 7
    got = masks.prp_lane_stream(rk, 1, 4, count, int_bits)  # (count, L)
    got_ints = lanes.lanes_to_ints(np.asarray(got), int_bits)
    want = masks.reference_mask_stream_host(SEED, 1, 4, count, int_bits)
    np.testing.assert_array_equal(got_ints, want)


def test_sharded_generation_matches_full_stream():
    # a shard starting at block b must reproduce the same lanes
    int_bits = 20
    merge = masks.merge_size(int_bits)
    rk = aes.key_schedule(SEED)
    full = np.asarray(masks.prp_lane_stream(rk, 0, 1, 4 * merge, int_bits))
    shard = np.asarray(
        masks.prp_lane_stream(rk, 0, 1, 2 * merge, int_bits, begin_block=2)
    )
    np.testing.assert_array_equal(shard, full[2 * merge : 4 * merge])


@pytest.mark.parametrize("int_bits", [20, 120])
def test_flashe_telescoping_identity(int_bits):
    """enc -> lane-add aggregate -> boundary-mask decrypt == mod-sum.

    Mirrors the end-to-end algebra of jzf_flashe.py: client i sends
    (q_i + a_i - a_{i+1}) mod 2^m; the arbiter lane-adds; adding a_n - a_0
    recovers sum(q_i) mod 2^m (decrypt path jzf_flashe.py:570-571 with
    prefixes from prepare_decrypt jzf_flashe.py:633-666).
    """
    n_clients, count, it = 4, 23, 7
    rk = aes.key_schedule(SEED)
    rng = np.random.RandomState(1)
    nl = lanes.nlimbs_for(int_bits)

    q_host = [
        np.array([rng.randint(0, 1 << 16) for _ in range(count)], dtype=object)
        for _ in range(n_clients)
    ]

    def enc(q, idx):
        add, minus = masks.flashe_mask_pair(rk, it, idx, idx + 1, count, int_bits)
        return lanes.lane_sub(lanes.lane_add(q, add, int_bits), minus, int_bits)

    cts = []
    for i in range(n_clients):
        q_dev = jnp.asarray(lanes.ints_to_lanes(q_host[i], int_bits))
        if nl == 1:
            q_dev = q_dev.reshape(count)
        cts.append(enc(q_dev, i))

    agg = cts[0]
    for c in cts[1:]:
        agg = lanes.lane_add(agg, c, int_bits)

    add, minus = masks.flashe_mask_pair(rk, it, n_clients, 0, count, int_bits)
    dec = lanes.lane_sub(lanes.lane_add(agg, add, int_bits), minus, int_bits)

    want = sum(q_host) % (1 << int_bits)
    got = lanes.lanes_to_ints(np.asarray(dec), int_bits)
    np.testing.assert_array_equal(got, want)


def test_dropout_subset_decryptable():
    """Aggregate of a surviving subset decrypts with run-merged boundary
    masks (reference set_idx_list mode='decrypt', jzf_flashe.py:354-386)."""
    int_bits, count, it = 20, 17, 2
    rk = aes.key_schedule(SEED)
    rng = np.random.RandomState(2)
    q = {i: np.array(rng.randint(0, 1 << 16, count), dtype=object) for i in [0, 1, 3]}

    def enc(qi, idx):
        add, minus = masks.flashe_mask_pair(rk, it, idx, idx + 1, count, int_bits)
        qd = jnp.asarray(lanes.ints_to_lanes(qi, int_bits))
        return lanes.lane_sub(lanes.lane_add(qd, add, int_bits), minus, int_bits)

    # clients 0,1,3 survive (2 dropped): runs [0,2) and [3,4)
    agg = enc(q[0], 0)
    agg = lanes.lane_add(agg, enc(q[1], 1), int_bits)
    agg = lanes.lane_add(agg, enc(q[3], 3), int_bits)

    # run-merge -> add prefixes {2, 4}, minus prefixes {0, 3}
    dec = agg
    for idx in (2, 4):
        dec = lanes.lane_add(dec, masks.prp_lane_stream(rk, it, idx, count, int_bits), int_bits)
    for idx in (0, 3):
        dec = lanes.lane_sub(dec, masks.prp_lane_stream(rk, it, idx, count, int_bits), int_bits)

    want = (q[0] + q[1] + q[3]) % (1 << int_bits)
    np.testing.assert_array_equal(lanes.lanes_to_ints(np.asarray(dec), int_bits), want)
