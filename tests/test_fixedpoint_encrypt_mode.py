"""Fixed-point float codec + re-encryption scheduling (reference stock
federatedml/secureprotol/fixedpoint.py and encrypt_mode.py)."""

import random

import numpy as np
import pytest

from flashe_tpu.crypto.encrypt_mode import EncryptModeCalculator
from flashe_tpu.crypto.fixedpoint import FixedPointNumber
from flashe_tpu.crypto.paillier import (
    FloatPaillier, PaillierEncryptedNumber, PaillierKeypair,
)
from flashe_tpu.data.table import init


def test_fixedpoint_roundtrip_and_arithmetic():
    for v in (0.0, 1.0, -1.0, 3.14159265, -2.71828e-7, 123456.789, 1e-12):
        assert FixedPointNumber.encode(v).decode() == pytest.approx(
            v, rel=1e-14)
    a = FixedPointNumber.encode(1.25)
    b = FixedPointNumber.encode(-0.75)
    assert (a + b).decode() == pytest.approx(0.5)
    assert (a - b).decode() == pytest.approx(2.0)
    assert (a * 4).decode() == pytest.approx(5.0)
    assert (a * b).decode() == pytest.approx(-0.9375)
    assert (a / 2).decode() == pytest.approx(0.625)
    assert (2.0 + a).decode() == pytest.approx(3.25)
    assert a > b and b < a and a >= 1.25 and a == 1.25 and a != 1.0
    # integer encoding keeps exponent 0
    assert FixedPointNumber.encode(42).exponent == 0
    # exponent alignment across magnitudes
    c = FixedPointNumber.encode(1e9) + FixedPointNumber.encode(1e-9)
    assert c.decode() == pytest.approx(1e9 + 1e-9)


@pytest.fixture(scope="module")
def small_keypair():
    # 512-bit: fast enough for unit tests, semantics identical
    return PaillierKeypair.generate_keypair(512)


def test_paillier_float_homomorphism(small_keypair):
    pub, priv = small_keypair
    cipher = FloatPaillier(pub, priv)
    x = cipher.encrypt(1.5)
    y = cipher.encrypt(-0.25)
    assert cipher.decrypt(x) == pytest.approx(1.5)
    assert cipher.decrypt(x + y) == pytest.approx(1.25)
    assert cipher.decrypt(x + 2.0) == pytest.approx(3.5)
    assert cipher.decrypt(x * 3.0) == pytest.approx(4.5)
    assert cipher.decrypt(x * -2.0) == pytest.approx(-3.0)
    assert cipher.decrypt(x - y) == pytest.approx(1.75)
    assert cipher.decrypt(sum([x, y, cipher.encrypt(0.75)], 0.0)
                          ) == pytest.approx(2.0)


@pytest.mark.parametrize("mode", ["strict", "fast", "balance",
                                  "confusion_opt"])
def test_encrypt_mode_calculator(small_keypair, mode):
    pub, priv = small_keypair
    cipher = FloatPaillier(pub, priv)
    calc = EncryptModeCalculator(cipher, mode=mode, re_encrypted_rate=0.5,
                                 rng=random.Random(0))
    s = init("emc")
    round1 = s.parallelize([1.0, -2.0, 3.5])
    enc1 = calc.encrypt(round1)
    got1 = sorted(cipher.decrypt(v) for _, v in enc1.collect())
    assert got1 == pytest.approx([-2.0, 1.0, 3.5])

    # second round with changed values must track the new plaintexts in
    # every mode (fast adds the diff homomorphically)
    round2 = s.parallelize([2.0, -1.0, 4.0])
    enc2 = calc.encrypt(round2)
    got2 = sorted(cipher.decrypt(v) for _, v in enc2.collect())
    assert got2 == pytest.approx([-1.0, 2.0, 4.0])


def test_encrypt_mode_calculator_arrays(small_keypair):
    pub, priv = small_keypair
    cipher = FloatPaillier(pub, priv)
    calc = EncryptModeCalculator(cipher, mode="fast")
    s = init("emc2")
    t1 = s.parallelize([np.array([1.0, 2.0]), np.array([3.0, 4.0])])
    e1 = calc.encrypt(t1)
    t2 = s.parallelize([np.array([1.5, 2.5]), np.array([3.5, 4.5])])
    e2 = calc.encrypt(t2)
    vals = [[cipher.decrypt(c) for c in row] for _, row in
            sorted(e2.collect())]
    assert vals == [pytest.approx([1.5, 2.5]), pytest.approx([3.5, 4.5])]
