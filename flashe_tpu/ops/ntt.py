"""RNS / NTT polynomial kernels for the BFV and CKKS baselines.

The reference wraps SEAL (via Pyfhel 2.2.5 / TenSEAL 0.3.1, C++) for its
general-HE baselines; here the ring arithmetic R_q = Z_q[X]/(X^N + 1) is
native JAX over RNS residues: q = prod of NTT-friendly ~30-bit primes,
residue tensors shaped (..., k, N) uint32, and all poly ops elementwise in
the NTT domain.

TPU has no 64-bit integer path worth using, so 32x32->64 products are
emulated with 16-bit splits (4 uint32 mults + carries) and modular
multiplication is 32-bit Montgomery (REDC), vectorized over (..., k, N).

The NTT is a Stockham-style iteration built ONLY from reshapes, slices and
concatenations — no gathers/scatters, which XLA:TPU handles poorly.
Negacyclic wrap (X^N = -1) is folded in by psi-twisting: forward multiplies
inputs by psi^i (psi a primitive 2N-th root), inverse untwists by psi^-i
and N^-1.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["RnsContext", "ntt", "intt", "find_ntt_primes"]


# ---------------------------------------------------------------------------
# host: prime/root discovery
# ---------------------------------------------------------------------------

def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def find_ntt_primes(count: int, bits: int, two_n: int) -> list[int]:
    """`count` primes p ~ 2^bits with p = 1 mod two_n (for 2N-th roots)."""
    out = []
    p = ((1 << bits) // two_n) * two_n + 1
    while len(out) < count:
        if p.bit_length() <= bits and _is_prime(p):
            out.append(p)
        p -= two_n
        if p < (1 << (bits - 1)):
            raise RuntimeError("not enough NTT primes")
    return out


def _primitive_2n_root(p: int, two_n: int) -> int:
    """A primitive two_n-th root of unity mod p."""
    for g in range(2, 1000):
        r = pow(g, (p - 1) // two_n, p)
        if pow(r, two_n // 2, p) == p - 1:  # order exactly two_n
            return r
    raise RuntimeError("no 2N-th root found")


# ---------------------------------------------------------------------------
# device: 32-bit Montgomery over vectors of residues
# ---------------------------------------------------------------------------

def _mul64(a: jnp.ndarray, b: jnp.ndarray):
    """Full 32x32 -> (hi, lo) uint32 product via 16-bit splits."""
    a0, a1 = a & 0xFFFF, a >> 16
    b0, b1 = b & 0xFFFF, b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    carry_mid = (mid < p01).astype(jnp.uint32)
    lo = p00 + (mid << 16)
    carry_lo = (lo < p00).astype(jnp.uint32)
    hi = p11 + (mid >> 16) + (carry_mid << 16) + carry_lo
    return hi, lo


def _mont_mul_p(a, b, p, p_inv_neg):
    """Montgomery product a*b*2^-32 mod p for p < 2^31.

    a, b in [0, p) (Montgomery domain); p, p_inv_neg broadcastable uint32,
    p_inv_neg = -p^-1 mod 2^32.
    """
    hi, lo = _mul64(a, b)
    m = lo * p_inv_neg  # mod 2^32
    uhi, ulo = _mul64(m, p)
    carry = (lo | ulo) != 0
    # lo + ulo == 0 mod 2^32 by construction
    t = hi + uhi + jnp.where(carry, jnp.uint32(1), jnp.uint32(0))
    return jnp.where(t >= p, t - p, t)


def _add_p(a, b, p):
    s = a + b
    return jnp.where(s >= p, s - p, s)


def _sub_p(a, b, p):
    return jnp.where(a >= b, a - b, a + p - b)


class RnsContext:
    """RNS basis with per-prime NTT tables.

    Residue tensors: (..., k, N) uint32 in the plain (non-Montgomery)
    domain; twiddle tables are stored in the Montgomery domain so each
    butterfly multiply is one REDC.
    """

    def __init__(self, N: int, primes: list[int]):
        self.N = N
        self.logN = N.bit_length() - 1
        if 1 << self.logN != N:
            raise ValueError("N must be a power of two")
        self.primes = list(primes)
        self.k = len(primes)
        self.q = int(np.prod([int(p) for p in primes], dtype=object))

        p_arr = np.array(primes, np.uint32)
        self.p = jnp.asarray(p_arr)[:, None]  # (k, 1) broadcast over N
        self.p_inv_neg = jnp.asarray(
            np.array([(-pow(p, -1, 1 << 32)) % (1 << 32) for p in primes],
                     np.uint32))[:, None]
        self.r2 = jnp.asarray(
            np.array([(1 << 64) % p for p in primes], np.uint32))[:, None]

        # psi (2N-th root) powers for twisting, omega = psi^2 for the NTT
        psi_pows = np.zeros((self.k, N), np.uint32)
        ipsi_pows = np.zeros((self.k, N), np.uint32)
        n_inv = np.zeros((self.k, 1), np.uint32)
        self._stage_tw = []  # per stage: (k, half) Montgomery twiddles
        self._stage_itw = []
        R = 1 << 32
        for ki, p in enumerate(primes):
            psi = _primitive_2n_root(p, 2 * N)
            ipsi = pow(psi, -1, p)
            pw, ipw = 1, 1
            for i in range(N):
                psi_pows[ki, i] = pw * R % p  # Montgomery domain
                ipsi_pows[ki, i] = ipw * R % p
                pw = pw * psi % p
                ipw = ipw * ipsi % p
            n_inv[ki, 0] = pow(N, -1, p) * R % p
        self.psi = jnp.asarray(psi_pows)
        self.ipsi = jnp.asarray(ipsi_pows)
        self.n_inv = jnp.asarray(n_inv)

        omega = [pow(_primitive_2n_root(p, 2 * N), 2, p) for p in primes]
        iomega = [pow(w, -1, p) for w, p in zip(omega, self.primes)]
        for s in range(self.logN):
            half = 1 << s
            span = N // (2 * half)  # number of blocks at this stage
            tw = np.zeros((self.k, half), np.uint32)
            itw = np.zeros((self.k, half), np.uint32)
            for ki, p in enumerate(primes):
                w = pow(omega[ki], span, p)
                iw = pow(iomega[ki], span, p)
                t, it_ = 1, 1
                for j in range(half):
                    tw[ki, j] = t * R % p
                    itw[ki, j] = it_ * R % p
                    t = t * w % p
                    it_ = it_ * iw % p
            self._stage_tw.append(jnp.asarray(tw))
            self._stage_itw.append(jnp.asarray(itw))

    # -- Montgomery helpers over (..., k, N) -------------------------------

    def mul(self, a, b):
        """Plain-domain modular multiply: REDC(REDC(a*b)*r2)."""
        t = _mont_mul_p(a, b, self.p, self.p_inv_neg)
        return _mont_mul_p(t, self.r2, self.p, self.p_inv_neg)

    def add(self, a, b):
        return _add_p(a, b, self.p)

    def sub(self, a, b):
        return _sub_p(a, b, self.p)

    def neg(self, a):
        return jnp.where(a == 0, a, self.p - a)

    def _mul_mont(self, a, b_mont):
        """a (plain) * b (Montgomery) -> plain."""
        return _mont_mul_p(a, b_mont, self.p, self.p_inv_neg)


def ntt(ctx: RnsContext, x: jnp.ndarray) -> jnp.ndarray:
    """Negacyclic forward NTT: (..., k, N) -> (..., k, N).

    Decimation-in-frequency: natural input, bit-reversed output.  The
    output permutation is harmless — pointwise products and intt (DIT,
    bit-reversed input -> natural output) use the same convention, so
    intt(ntt(a) * ntt(b)) is the exact negacyclic convolution.
    """
    x = ctx._mul_mont(x, ctx.psi)  # psi-twist
    N = ctx.N
    p3 = ctx.p[..., None]
    pin3 = ctx.p_inv_neg[..., None]
    for s in reversed(range(ctx.logN)):
        half = 1 << s
        blocks = N // (2 * half)
        xr = x.reshape(x.shape[:-1] + (blocks, 2, half))
        a, b = xr[..., 0, :], xr[..., 1, :]
        top = _add_p(a, b, p3)
        bot = _mont_mul_p(_sub_p(a, b, p3), ctx._stage_tw[s][:, None, :],
                          p3, pin3)
        x = jnp.stack([top, bot], axis=-2).reshape(x.shape[:-1] + (N,))
    return x


def intt(ctx: RnsContext, x: jnp.ndarray) -> jnp.ndarray:
    """Negacyclic inverse NTT (DIT; inverse of `ntt` exactly)."""
    N = ctx.N
    p3 = ctx.p[..., None]
    pin3 = ctx.p_inv_neg[..., None]
    for s in range(ctx.logN):
        half = 1 << s
        blocks = N // (2 * half)
        xr = x.reshape(x.shape[:-1] + (blocks, 2, half))
        a = xr[..., 0, :]
        t = _mont_mul_p(xr[..., 1, :], ctx._stage_itw[s][:, None, :],
                        p3, pin3)
        top = _add_p(a, t, p3)
        bot = _sub_p(a, t, p3)
        x = jnp.stack([top, bot], axis=-2).reshape(x.shape[:-1] + (N,))
    x = ctx._mul_mont(x, ctx.ipsi)
    return ctx._mul_mont(x, jnp.broadcast_to(ctx.n_inv, ctx.ipsi.shape))
