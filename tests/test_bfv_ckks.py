"""BFV / CKKS baseline ciphers: roundtrip and homomorphic-sum tests
(the capability the aggregation pipeline exercises,
jzf_aggregator.py:440-448)."""

import numpy as np
import pytest

from flashe_tpu.crypto.bfv import BFVCipher
from flashe_tpu.crypto.ckks import CKKSCipher

pytestmark = pytest.mark.slow  # HE kernels: minutes on CPU; run in the full suite


def test_bfv_roundtrip_nobatch():
    c = BFVCipher(p=1032193, m=64, flagBatching=False, seed=0).generate_keys()
    msgs = np.array([0, 1, 5, 1032192, 77777], np.uint32)
    cts = c.encrypt(msgs)
    dec = c.decrypt(cts, len(msgs))
    np.testing.assert_array_equal(dec, msgs)


def test_bfv_roundtrip_batch():
    # t = 1 mod 2N needed for batching
    t = 1964769281  # the reference's batching plaintext modulus
    N = 64
    assert (t - 1) % (2 * N) == 0
    c = BFVCipher(p=t, m=N, flagBatching=True, seed=1).generate_keys()
    rng = np.random.RandomState(0)
    msgs = rng.randint(0, 1 << 20, 150).astype(np.uint32)
    cts = c.encrypt(msgs)
    assert cts.shape[0] == 3  # ceil(150/64) ciphertexts
    dec = c.decrypt(cts, len(msgs))
    np.testing.assert_array_equal(dec, msgs)


def test_bfv_homomorphic_sum():
    t = 1964769281
    c = BFVCipher(p=t, m=64, flagBatching=True, seed=2).generate_keys()
    rng = np.random.RandomState(1)
    batches = [rng.randint(0, 1 << 16, 100).astype(np.uint32)
               for _ in range(10)]
    cts = [c.encrypt(b) for b in batches]
    agg = c.add_ciphertexts(cts)
    dec = c.decrypt(agg, 100)
    want = np.sum(np.stack(batches).astype(np.uint64), axis=0) % t
    np.testing.assert_array_equal(dec.astype(np.uint64), want)
    assert c.noise_level(agg) > 10  # plenty of budget after 10 adds


def test_bfv_secret_transfer():
    c1 = BFVCipher(p=1032193, m=64, seed=3).generate_keys()
    c2 = BFVCipher(p=1032193, m=64, seed=99)
    c2.load_secret(c1.serialize_secret())
    c2.set_public_parts(c1.public_parts())
    msgs = np.array([42, 7], np.uint32)
    np.testing.assert_array_equal(c2.decrypt(c1.encrypt(msgs), 2), msgs)


def test_ckks_roundtrip():
    c = CKKSCipher(poly_modulus_degree=64, seed=0).generate_keys()
    rng = np.random.RandomState(2)
    vals = rng.randn(80).astype(np.float64) * 0.5
    cts = c.encrypt(vals)
    dec = c.decrypt(cts, len(vals))
    # approximate HE: error ~ noise/scale
    assert np.max(np.abs(dec - vals)) < 1e-6


def test_ckks_homomorphic_sum():
    c = CKKSCipher(poly_modulus_degree=64, seed=1).generate_keys()
    rng = np.random.RandomState(3)
    batches = [rng.randn(50) * 0.1 for _ in range(10)]
    cts = [c.encrypt(b) for b in batches]
    agg = c.add_ciphertexts(cts)
    dec = c.decrypt(agg, 50)
    want = np.sum(np.stack(batches), axis=0)
    assert np.max(np.abs(dec - want)) < 1e-5
