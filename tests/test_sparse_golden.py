"""Golden test: sparse (compact-counter) masking == reference semantics.

The reference's exercised sparse path is single masking with compact
counters (jzf_flashe.py:306-343): client i encrypts its top-s% compacted
vector with stream prefix (iter, i) at counters 0..len(loc_i)-1; decrypt
(set_idx_list_single mode="decrypt" with masks set, jzf_flashe.py:315-342)
regenerates each client's compact stream, scatters it to that client's
dense locations, and subtracts the mod-2^m accumulation.  The expectation
here is computed entirely with the host AES oracle
(ops.masks.reference_mask_stream_host) and python ints — no device code —
so it pins the device cipher against the reference bit-for-bit.

Config-validation tests cover the sparsity-composition matrix: flashe /
plain / paillier compose (the reference ships s100 configs for each,
examples/configs/{cnn_flashe_q16_b1_pad_no_pre_s100_dyn,
cnn_plain_q16_pad_s100, cnn_paillier_q16_b1_pad_s100}); bfv / ckks /
additive and quantizer batching are rejected with clear errors.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flashe_tpu.crypto.flashe import FlasheCipher
from flashe_tpu.ops import masks
from flashe_tpu.runtime.config import (
    HomoNNParam, QuantizeConfig, SecureAggregateArgs,
)

SEED = bytes(range(100, 132))
INT_BITS = 20
MOD = 1 << INT_BITS
TOTAL = 37
ITER = 5


def _make_cipher(mask_scheme, n_clients, locs):
    c = FlasheCipher(INT_BITS, mask=mask_scheme)
    c.generate_prp_seed(SEED)
    c.set_num_clients(n_clients)
    c.set_iter_index(ITER)
    c.set_masks(locs, TOTAL)
    return c


def _host_stream(client_idx, count):
    return masks.reference_mask_stream_host(SEED, ITER, client_idx, count,
                                            INT_BITS)


@pytest.mark.parametrize("mask_scheme", ["single", "double"])
def test_sparse_compact_counter_golden(mask_scheme):
    n_clients = 3
    rng = np.random.RandomState(7)
    locs = [np.sort(rng.choice(TOTAL, size=cnt, replace=False))
            for cnt in (9, 14, 6)]
    qz = 77  # stand-in plaintext quantized zero filler
    qs = [rng.randint(0, 1 << 16, size=len(l)).astype(object)
          for l in locs]

    # -- encrypt + densify + aggregate, all with the HOST oracle ----------
    dense_agg = np.zeros(TOTAL, dtype=object)
    for i, (q, loc) in enumerate(zip(qs, locs)):
        add = _host_stream(i, len(loc))
        ct = (q + add) % MOD
        if mask_scheme == "double":
            minus = _host_stream(i + 1, len(loc))
            ct = (ct - minus) % MOD
        dense = np.full(TOTAL, qz, dtype=object)
        dense[loc] = ct
        dense_agg = (dense_agg + dense) % MOD

    # expected plaintext sum (values at locations, fillers elsewhere)
    expected = np.zeros(TOTAL, dtype=object)
    for q, loc in zip(qs, locs):
        dense = np.full(TOTAL, qz, dtype=object)
        dense[loc] = q
        expected = (expected + dense) % MOD

    # -- device decrypt must recover it bit-for-bit -----------------------
    cipher = _make_cipher(mask_scheme, n_clients, locs)
    got = cipher.decrypt(jnp.asarray(dense_agg.astype(np.uint32)),
                         idx_list=list(range(n_clients)))
    np.testing.assert_array_equal(
        np.asarray(got).astype(object), expected)


def test_sparse_device_encrypt_matches_host_oracle():
    """Device-side compact encrypt == host oracle compact encrypt."""
    n_clients, cnt = 3, 11
    rng = np.random.RandomState(3)
    q = rng.randint(0, 1 << 16, size=cnt).astype(np.uint32)

    c = FlasheCipher(INT_BITS, mask="single")
    c.generate_prp_seed(SEED)
    c.set_num_clients(n_clients)
    c.set_iter_index(ITER)
    c.idx = 1
    got = np.asarray(c.encrypt(jnp.asarray(q)))

    add = _host_stream(1, cnt)
    want = (q.astype(object) + add) % MOD
    np.testing.assert_array_equal(got.astype(object), want)


# -- sparsity-composition validation (VERDICT round 2, item 7) -----------

def _param(scheme, sparsity=0.1, batch=False):
    return HomoNNParam(
        secure_aggregate=scheme, sparsity=sparsity,
        secure_aggregate_args=SecureAggregateArgs(
            quantize=QuantizeConfig(batch=batch)))


@pytest.mark.parametrize("scheme", ["flashe", "plain", "paillier"])
def test_sparsity_supported_schemes_pass(scheme):
    _param(scheme).check()


@pytest.mark.parametrize("scheme", ["bfv", "ckks", "additive"])
def test_sparsity_rejected_schemes(scheme):
    with pytest.raises(ValueError, match="sparsity"):
        _param(scheme).check()


def test_sparsity_rejects_batching():
    with pytest.raises(ValueError, match="batch"):
        _param("flashe", batch=True).check()


def test_dense_batch_still_allowed():
    _param("flashe", sparsity=1.0, batch=True).check()
