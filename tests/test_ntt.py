"""NTT/RNS kernel correctness vs python-int oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from flashe_tpu.ops import ntt as nttmod


@pytest.fixture(scope="module")
def ctx():
    N = 64
    primes = nttmod.find_ntt_primes(2, 30, 2 * N)
    return nttmod.RnsContext(N, primes)


def test_mont_mul_p(ctx):
    rng = np.random.RandomState(0)
    primes = np.array(ctx.primes, np.uint64)
    a = (rng.randint(0, 1 << 30, (ctx.k, 8)) % primes[:, None]).astype(np.uint32)
    b = (rng.randint(0, 1 << 30, (ctx.k, 8)) % primes[:, None]).astype(np.uint32)
    got = np.asarray(ctx.mul(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(np.uint64) * b.astype(np.uint64)) % primes[:, None]
    np.testing.assert_array_equal(got.astype(np.uint64), want)


@pytest.mark.slow
def test_ntt_roundtrip(ctx):
    rng = np.random.RandomState(1)
    x = np.stack([
        rng.randint(0, p, ctx.N).astype(np.uint32) for p in ctx.primes
    ])
    back = np.asarray(nttmod.intt(ctx, nttmod.ntt(ctx, jnp.asarray(x))))
    np.testing.assert_array_equal(back, x)


def test_pointwise_mult_is_negacyclic_convolution(ctx):
    rng = np.random.RandomState(2)
    N = ctx.N
    a_int = [int(v) for v in rng.randint(0, 1000, N)]
    b_int = [int(v) for v in rng.randint(0, 1000, N)]
    # oracle: negacyclic convolution over Z (X^N = -1), then mod p
    conv = [0] * N
    for i in range(N):
        for j in range(N):
            k = i + j
            if k < N:
                conv[k] += a_int[i] * b_int[j]
            else:
                conv[k - N] -= a_int[i] * b_int[j]
    a = np.stack([np.array(a_int, np.uint32) % p for p in ctx.primes])
    b = np.stack([np.array(b_int, np.uint32) % p for p in ctx.primes])
    fa = nttmod.ntt(ctx, jnp.asarray(a))
    fb = nttmod.ntt(ctx, jnp.asarray(b))
    got = np.asarray(nttmod.intt(ctx, ctx.mul(fa, fb)))
    for ki, p in enumerate(ctx.primes):
        want = np.array([c % p for c in conv], np.uint32)
        np.testing.assert_array_equal(got[ki], want)


def test_ntt_linearity_add(ctx):
    rng = np.random.RandomState(3)
    x = np.stack([rng.randint(0, p, ctx.N).astype(np.uint32)
                  for p in ctx.primes])
    y = np.stack([rng.randint(0, p, ctx.N).astype(np.uint32)
                  for p in ctx.primes])
    fx = nttmod.ntt(ctx, jnp.asarray(x))
    fy = nttmod.ntt(ctx, jnp.asarray(y))
    lhs = np.asarray(nttmod.intt(ctx, ctx.add(fx, fy)))
    rhs = np.stack([
        ((x[k].astype(np.uint64) + y[k]) % ctx.primes[k]).astype(np.uint32)
        for k in range(ctx.k)
    ])
    np.testing.assert_array_equal(lhs, rhs)
