"""Multi-device party fan-out for the baseline HE schemes.

The reference fans every scheme's client crypto across a silo's cores:
Paillier per-element Pool (jzf_paillier.py:190-237), BFV per-ciphertext
Pool (jzf_bfv.py:116-173).  Here a party with local devices chunks the
batch axis across them (parallel/fanout.DeviceFanout).  These tests pin
value-exactness against the single-device path: decrypt is
deterministic, so fanned decrypt must be bit-equal; encrypt draws
randomness, so fanned encrypt must roundtrip/aggregate to the same
values.  Runs on the 8-virtual-CPU-device mesh from conftest.
"""

import numpy as np
import pytest

from flashe_tpu.crypto import paillier
from flashe_tpu.crypto.bfv import BFVCipher
from flashe_tpu.crypto.ckks import CKKSCipher

pytestmark = pytest.mark.slow  # HE kernels: minutes cold on CPU


def test_paillier_fanout_encrypt_decrypt_exact():
    c = paillier.PaillierCipher()
    c.generate_key(n_length=512)
    rng = np.random.RandomState(0)
    vals = np.array([int(v) for v in rng.randint(0, 1 << 30, 24)],
                    dtype=object)

    cts_single = c.encrypt(vals)
    c.set_local_devices(4)
    assert c._fanout is not None and c._fanout.n_shards == 4
    cts_fan = c.encrypt(vals)

    # decrypt is deterministic: fanned decrypt of the same ciphertexts
    # must be bit-equal to single-device decrypt
    dec_fan = c.decrypt(cts_single)
    c._fanout = None
    dec_single = c.decrypt(cts_single)
    np.testing.assert_array_equal(dec_fan, dec_single)
    np.testing.assert_array_equal(dec_single, vals)

    # fanned encrypt (fresh obfuscators) still decrypts to the values
    np.testing.assert_array_equal(c.decrypt(cts_fan), vals)


def test_paillier_fanout_small_batch_stays_single():
    c = paillier.PaillierCipher()
    c.generate_key(n_length=512)
    c.set_local_devices(8)
    vals = np.array([3, 4], dtype=object)  # < 2*n_shards: single path
    np.testing.assert_array_equal(c.decrypt(c.encrypt(vals)), vals)


def test_bfv_fanout_roundtrip_and_aggregate():
    t = 1964769281
    c = BFVCipher(p=t, m=64, flagBatching=True, seed=3).generate_keys()
    rng = np.random.RandomState(2)
    batches = [rng.randint(0, 1 << 16, 600).astype(np.uint32)
               for _ in range(4)]

    cts_single = [np.asarray(c.encrypt(b)) for b in batches]
    c.set_local_devices(4)
    assert c._fanout is not None
    cts_fan = [np.asarray(c.encrypt(b)) for b in batches]
    assert cts_fan[0].shape == cts_single[0].shape  # ceil(600/64)=10 rows

    # deterministic decrypt: fanned == single on identical ciphertexts
    agg = c.add_ciphertexts(cts_single)
    dec_fan = c.decrypt(agg, 600)
    c._fanout = None
    dec_single = c.decrypt(agg, 600)
    np.testing.assert_array_equal(dec_fan, dec_single)
    want = np.sum(np.stack(batches).astype(np.uint64), axis=0) % t
    np.testing.assert_array_equal(dec_single.astype(np.uint64), want)

    # fanned-encrypt ciphertexts aggregate to the same values
    c.set_local_devices(4)
    agg_fan = c.add_ciphertexts(cts_fan)
    np.testing.assert_array_equal(
        c.decrypt(agg_fan, 600).astype(np.uint64), want)


def test_ckks_fanout_roundtrip_and_aggregate():
    c = CKKSCipher(poly_modulus_degree=1024, seed=4).generate_keys()
    rng = np.random.RandomState(3)
    batches = [rng.randn(2000).astype(np.float64) for _ in range(3)]

    cts_single = [np.asarray(c.encrypt(b)) for b in batches]
    c.set_local_devices(4)
    assert c._fanout is not None
    cts_fan = [np.asarray(c.encrypt(b)) for b in batches]

    agg = c.add_ciphertexts(cts_single)
    dec_fan = np.asarray(c.decrypt(agg, 2000))
    c._fanout = None
    dec_single = np.asarray(c.decrypt(agg, 2000))
    np.testing.assert_array_equal(dec_fan, dec_single)
    want = np.sum(np.stack(batches), axis=0)
    np.testing.assert_allclose(dec_single, want, atol=1e-2)

    c.set_local_devices(4)
    agg_fan = c.add_ciphertexts(cts_fan)
    np.testing.assert_allclose(np.asarray(c.decrypt(agg_fan, 2000)),
                               want, atol=1e-2)
