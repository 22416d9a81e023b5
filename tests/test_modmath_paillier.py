"""Montgomery limb kernels and the Paillier baseline vs python-int oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from flashe_tpu.crypto import paillier
from flashe_tpu.ops import modmath

pytestmark = pytest.mark.slow  # HE kernels: minutes on CPU; run in the full suite


def test_limb_roundtrip():
    vals = [0, 1, (1 << 500) - 3, 123456789 ** 5]
    limbs = modmath.to_limbs(vals, 40)
    assert modmath.from_limbs(limbs) == vals


def test_add_sub_limbs():
    rng = np.random.RandomState(0)
    L = 20
    a = [int.from_bytes(rng.bytes(L * 2 - 1), "big") for _ in range(8)]
    b = [int.from_bytes(rng.bytes(L * 2 - 1), "big") for _ in range(8)]
    A = jnp.asarray(modmath.to_limbs(a, L))
    B = jnp.asarray(modmath.to_limbs(b, L))
    R = 1 << (16 * L)
    got_add = modmath.from_limbs(np.asarray(modmath.add_limbs(A, B)))
    assert got_add == [(x + y) % R for x, y in zip(a, b)]
    got_sub = modmath.from_limbs(np.asarray(modmath.sub_limbs(A, B)))
    assert got_sub == [(x - y) % R for x, y in zip(a, b)]


@pytest.mark.parametrize("nbits", [256, 1024])
def test_mont_mul_and_exp(nbits):
    rng = np.random.RandomState(1)
    # deterministic odd modulus
    n = (int.from_bytes(rng.bytes(nbits // 8), "big") | (1 << (nbits - 1))) | 1
    ctx = modmath.MontCtx(n)
    a = [int.from_bytes(rng.bytes(nbits // 8 - 1), "big") % n for _ in range(5)]
    b = [int.from_bytes(rng.bytes(nbits // 8 - 1), "big") % n for _ in range(5)]
    A = modmath.mont_from(ctx, jnp.asarray(modmath.to_limbs(a, ctx.L)))
    B = modmath.mont_from(ctx, jnp.asarray(modmath.to_limbs(b, ctx.L)))
    prod = modmath.mont_to(ctx, modmath.mont_mul(ctx, A, B))
    got = modmath.from_limbs(np.asarray(prod))
    assert got == [(x * y) % n for x, y in zip(a, b)]

    e = 0x10001
    ebits = jnp.asarray(modmath.exponent_bits(e, 17))
    powed = modmath.mont_to(ctx, modmath.mont_exp(ctx, A, ebits))
    got = modmath.from_limbs(np.asarray(powed))
    assert got == [pow(x, e, n) for x in a]


def test_paillier_roundtrip_small_key():
    c = paillier.PaillierCipher()
    c.generate_key(n_length=512)  # small key: fast tests, same kernels
    rng = np.random.RandomState(2)
    msgs = np.array([int(v) for v in rng.randint(0, 1 << 40, 6)], dtype=object)
    cts = c.encrypt(msgs)
    dec = c.decrypt(cts)
    assert list(dec) == list(msgs)


def test_paillier_homomorphic_sum():
    c = paillier.PaillierCipher()
    c.generate_key(n_length=512)
    rng = np.random.RandomState(3)
    batches = [
        np.array([int(v) for v in rng.randint(0, 1 << 30, 4)], dtype=object)
        for _ in range(3)
    ]
    cts = [c.encrypt(b) for b in batches]
    agg = c.add_ciphertexts(cts)
    dec = c.decrypt(agg)
    want = [int(sum(b[i] for b in batches)) for i in range(4)]
    assert list(dec) == want


def test_device_encrypt_matches_host_oracle():
    """The device modexp path must agree with host pow() for fixed r."""
    pub, prv = paillier.PaillierKeypair.generate_keypair(512)
    c = paillier.PaillierCipher()
    c.set_public_key(pub)
    c.set_privacy_key(prv)
    # deterministic obfuscators for reproducibility
    rs = [12345, 67890, 13579]
    c._obfuscators = lambda count: rs[:count]
    msgs = np.array([1, 2, 3], dtype=object)
    cts = c.encrypt(msgs)
    want = [pub.encrypt_scalar(int(m), r) for m, r in zip(msgs, rs)]
    assert list(cts) == want


def test_mont_exp_window_matches_pow():
    rng = np.random.RandomState(5)
    nbits = 512
    n = (int.from_bytes(rng.bytes(nbits // 8), "big") | (1 << (nbits - 1))) | 1
    ctx = modmath.MontCtx(n)
    a = [int.from_bytes(rng.bytes(nbits // 8 - 1), "big") % n
         for _ in range(4)]
    e = int.from_bytes(rng.bytes(64), "big")  # 512-bit exponent
    A = modmath.mont_from(ctx, jnp.asarray(modmath.to_limbs(a, ctx.L)))
    digs = jnp.asarray(modmath.exponent_digits(e, e.bit_length()))
    got = modmath.from_limbs(
        np.asarray(modmath.mont_to(ctx, modmath.mont_exp_window(ctx, A, digs))))
    assert got == [pow(x, e, n) for x in a]


def test_pallas_mont_mul_matches_xla():
    """The VMEM-resident Pallas CIOS kernel is bit-identical to the XLA
    mont_mul (interpret mode on CPU)."""
    import jax.numpy as jnp

    from flashe_tpu.ops import modmath
    from flashe_tpu.ops.pallas_modmath import pallas_mont_mul

    rng = np.random.RandomState(5)
    n = 0
    while n % 2 == 0:
        n = int(rng.randint(1, 1 << 62)) | (1 << 511)
    ctx = modmath.MontCtx(n)
    vals_a = [int(rng.randint(0, 1 << 60)) % n for _ in range(9)]
    vals_b = [int(rng.randint(0, 1 << 60)) % n for _ in range(9)]
    a = jnp.asarray(modmath.to_limbs(vals_a, ctx.L))
    b = jnp.asarray(modmath.to_limbs(vals_b, ctx.L))
    want = modmath.mont_mul(ctx, a, b)  # XLA path (CPU)
    got = pallas_mont_mul(ctx, a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and the math itself: a*b*R^-1 mod n
    want_ints = [(va * vb * pow(ctx.R, -1, n)) % n
                 for va, vb in zip(vals_a, vals_b)]
    np.testing.assert_array_equal(
        np.asarray(modmath.from_limbs(np.asarray(got)), dtype=object),
        np.asarray(want_ints, dtype=object))
