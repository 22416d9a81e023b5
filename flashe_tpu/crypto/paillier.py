"""Paillier baseline cipher with TPU limb-kernel modexp.

Mirrors federatedml/secureprotol/jzf_paillier.py (textbook Paillier, CRT
decryption, shared keypair in the semi-honest model: the guest generates
and AES-wraps the private key for hosts; the arbiter only multiplies
ciphertexts mod n^2).  The hot loop — r^n mod n^2 per element, the part
the reference spreads over multiprocessing pools — runs as the vectorized
Montgomery modexp kernel (flashe_tpu/ops/modmath.py) over the whole
ciphertext batch at once.  Cheap big-int assembly (1+n*m, the L-function
and CRT combine of decryption) stays on host: O(batch) python-int ops
against O(batch * key_bits^2) limb work on device.
"""

from __future__ import annotations

import random

import numpy as np
import jax
import jax.numpy as jnp

from flashe_tpu.ops import modmath

__all__ = ["PaillierKeypair", "PaillierPublicKey", "PaillierPrivateKey",
           "PaillierCipher", "getprimeover"]

_SMALL_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47]


def _is_probable_prime(n: int, rounds: int = 30) -> bool:
    if n < 2:
        return False
    for p in _SMALL_PRIMES:
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    rng = random.SystemRandom()
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = (x * x) % n
            if x == n - 1:
                break
        else:
            return False
    return True


def getprimeover(bits: int) -> int:
    """Random prime with the top bit set (gmpy_math.getprimeover parity)."""
    rng = random.SystemRandom()
    while True:
        cand = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
        if _is_probable_prime(cand):
            return cand


class PaillierPublicKey:
    def __init__(self, n: int):
        self.n = n
        self.g = n + 1
        self.nsquare = n * n
        self.max_int = n // 3 - 1

    def get_n(self):
        return self.n

    def encrypt_scalar(self, m: int, r: int | None = None) -> int:
        """Host-side scalar encrypt (oracle for the device kernel)."""
        if r is None:
            r = random.SystemRandom().randrange(1, self.n)
        c = (self.n * m + 1) % self.nsquare
        return (c * pow(r, self.n, self.nsquare)) % self.nsquare


class PaillierPrivateKey:
    def __init__(self, public_key: PaillierPublicKey, p: int, q: int):
        if p * q != public_key.n:
            raise ValueError("keypair mismatch")
        self.public_key = public_key
        self.p, self.q = (q, p) if q < p else (p, q)
        self.psquare = self.p * self.p
        self.qsquare = self.q * self.q
        self.q_inverse = pow(self.q, -1, self.p)
        self.hp = self._h(self.p, self.psquare)
        self.hq = self._h(self.q, self.qsquare)

    def _l(self, x: int, p: int) -> int:
        return (x - 1) // p

    def _h(self, x: int, xsquare: int) -> int:
        return pow(self._l(pow(self.public_key.g, x - 1, xsquare), x), -1, x)

    def decrypt_scalar(self, c: int) -> int:
        mp = self._l(pow(c, self.p - 1, self.psquare), self.p) * self.hp % self.p
        mq = self._l(pow(c, self.q - 1, self.qsquare), self.q) * self.hq % self.q
        u = (mp - mq) * self.q_inverse % self.p
        return (mq + u * self.q) % self.public_key.n


class PaillierEncryptedNumber:
    """Float-valued Paillier ciphertext (python-paillier semantics, the
    surface the reference's stock secureprotol exposes for hetero-FL:
    fixed-point encoding + homomorphic float add / scalar mul).  The
    FLASHE pipeline itself moves quantized int vectors through the limb
    kernels instead; this type backs EncryptModeCalculator parity."""

    def __init__(self, public_key: PaillierPublicKey, ciphertext: int,
                 exponent: int):
        self.public_key = public_key
        self.ciphertext = ciphertext
        self.exponent = exponent

    @classmethod
    def encrypt(cls, public_key: PaillierPublicKey, value,
                r: int | None = None) -> "PaillierEncryptedNumber":
        from flashe_tpu.crypto.fixedpoint import FixedPointNumber

        fp = FixedPointNumber.encode(value, public_key.n,
                                     public_key.max_int)
        return cls(public_key, public_key.encrypt_scalar(fp.encoding, r),
                   fp.exponent)

    def decrypt(self, privacy_key: PaillierPrivateKey) -> float:
        from flashe_tpu.crypto.fixedpoint import FixedPointNumber

        enc = privacy_key.decrypt_scalar(self.ciphertext)
        return FixedPointNumber(enc, self.exponent, self.public_key.n,
                                self.public_key.max_int).decode()

    def _decrease_exponent_to(self, new_exponent: int
                              ) -> "PaillierEncryptedNumber":
        from flashe_tpu.crypto.fixedpoint import FixedPointNumber

        if new_exponent > self.exponent:
            raise ValueError("cannot decrease exponent upward")
        factor = pow(FixedPointNumber.BASE, self.exponent - new_exponent)
        ct = pow(self.ciphertext, factor, self.public_key.nsquare)
        return PaillierEncryptedNumber(self.public_key, ct, new_exponent)

    def __add__(self, other):
        if not isinstance(other, PaillierEncryptedNumber):
            other = PaillierEncryptedNumber.encrypt(self.public_key,
                                                    float(other))
        a, b = self, other
        if a.exponent > b.exponent:
            a = a._decrease_exponent_to(b.exponent)
        elif b.exponent > a.exponent:
            b = b._decrease_exponent_to(a.exponent)
        ct = (a.ciphertext * b.ciphertext) % self.public_key.nsquare
        return PaillierEncryptedNumber(self.public_key, ct, a.exponent)

    __radd__ = __add__

    def __sub__(self, other):
        return self + (other * -1 if isinstance(
            other, PaillierEncryptedNumber) else -float(other))

    def __mul__(self, scalar):
        from flashe_tpu.crypto.fixedpoint import FixedPointNumber

        fp = FixedPointNumber.encode(float(scalar), self.public_key.n,
                                     self.public_key.max_int)
        enc = fp.encoding
        if enc >= self.public_key.n - self.public_key.max_int:
            # negative scalar: multiply by |scalar| via the inverse ct
            neg_ct = pow(self.ciphertext, -1, self.public_key.nsquare)
            ct = pow(neg_ct, self.public_key.n - enc,
                     self.public_key.nsquare)
        else:
            ct = pow(self.ciphertext, enc, self.public_key.nsquare)
        return PaillierEncryptedNumber(self.public_key, ct,
                                       self.exponent + fp.exponent)

    __rmul__ = __mul__


class FloatPaillier:
    """python-paillier-style facade used by EncryptModeCalculator."""

    def __init__(self, public_key: PaillierPublicKey,
                 privacy_key: PaillierPrivateKey | None = None):
        self.public_key = public_key
        self.privacy_key = privacy_key

    def encrypt(self, value) -> PaillierEncryptedNumber:
        return PaillierEncryptedNumber.encrypt(self.public_key, value)

    def decrypt(self, number: PaillierEncryptedNumber) -> float:
        if self.privacy_key is None:
            raise ValueError("no private key on this party")
        return number.decrypt(self.privacy_key)


class PaillierKeypair:
    @staticmethod
    def generate_keypair(n_length: int = 2048):
        n_len = 0
        while n_len != n_length:
            p = getprimeover(n_length // 2)
            q = p
            while q == p:
                q = getprimeover(n_length // 2)
            n = p * q
            n_len = n.bit_length()
        pub = PaillierPublicKey(n)
        return pub, PaillierPrivateKey(pub, p, q)


class PaillierCipher:
    """Vectorized Paillier over limb arrays.

    Values and ciphertexts at this interface are python-int numpy object
    arrays (they come from the batching quantizer as big ints).
    """

    def __init__(self):
        self.public_key: PaillierPublicKey | None = None
        self.privacy_key: PaillierPrivateKey | None = None
        self.n = None
        self._ctx2: modmath.MontCtx | None = None
        self._ndigits_dev = None
        self._chain_cache: dict = {}
        self._fanout = None

    def set_local_devices(self, n_shards=None, devices=None):
        """Fan this party's batch encrypt/decrypt over its local devices
        (the reference's per-silo Pool over contiguous chunks,
        jzf_paillier.py:190-237): modexp rows are independent, so chunks
        dispatch concurrently with no collectives.  A 1-device fan-out
        disables the route."""
        from flashe_tpu.parallel.fanout import DeviceFanout

        f = DeviceFanout(n_shards, devices)
        self._fanout = f if f.n_shards > 1 else None

    # -- key management (reference jzf_paillier.py:152-185) ----------------

    def generate_key(self, n_length: int = 2048):
        pub, priv = PaillierKeypair.generate_keypair(n_length)
        self.public_key = pub
        self.set_public_key(pub)
        self.set_privacy_key(priv)

    def set_public_key(self, public_key: PaillierPublicKey):
        self.public_key = public_key
        self.n = public_key.n
        self._ctx2 = modmath.MontCtx(public_key.nsquare)
        self._ndigits_dev = jnp.asarray(
            modmath.exponent_digits(self.n, self.n.bit_length()))

    def set_privacy_key(self, privacy_key: PaillierPrivateKey):
        self.privacy_key = privacy_key
        # CRT decrypt contexts built ONCE: constructing MontCtx per
        # decrypt call discarded the per-context jit cache, so every
        # decrypt re-traced the whole windowed modexp (~2 s constant per
        # call — the r3 table2 paillier-decrypt regression)
        sk = privacy_key
        self._ctx_p = modmath.MontCtx(sk.psquare)
        self._ctx_q = modmath.MontCtx(sk.qsquare)
        # merged chain: both CRT exponentiations run as ONE per-row-
        # modulus batch — half the sequential depth (modmath.PairMontCtx)
        self._pair_ctx = modmath.PairMontCtx(sk.psquare, sk.qsquare)
        nbits = max(sk.p.bit_length(), sk.q.bit_length())
        self._ep_dev = jnp.asarray(
            modmath.exponent_digits(sk.p - 1, nbits))
        self._eq_dev = jnp.asarray(
            modmath.exponent_digits(sk.q - 1, nbits))

    def get_n(self):
        return self.n

    def get_key_pair(self):
        return self.public_key, self.privacy_key

    # -- vectorized encrypt/decrypt ----------------------------------------

    def _obfuscators(self, count: int) -> list:
        rng = random.SystemRandom()
        return [rng.randrange(1, self.n) for _ in range(count)]

    def encrypt(self, values) -> np.ndarray:
        """values: object ints in [0, n) -> object-int ciphertexts mod n^2.

        Device kernel computes s = r^n mod n^2 for the whole batch; the
        host assembles c = (1 + n*m) * s mod n^2.
        """
        vals = [int(v) for v in np.asarray(values, dtype=object).ravel()]
        ctx = self._ctx2
        rs = self._obfuscators(len(vals))
        r_host = modmath.to_limbs(rs, ctx.L)
        if (self._fanout is not None
                and len(vals) >= 2 * self._fanout.n_shards):

            def job(i, r_chunk):
                s = modmath.mont_exp_window(
                    ctx, modmath.mont_from(ctx, r_chunk),
                    self._ndigits_dev)
                return modmath.mont_to(ctx, s)

            s_np = self._fanout.run(job, r_host)
        else:
            s = modmath.mont_exp_window(
                ctx, modmath.mont_from(ctx, jnp.asarray(r_host)),
                self._ndigits_dev)
            s_np = np.asarray(modmath.mont_to(ctx, s))
        s_ints = modmath.from_limbs(s_np)
        nsq = self.public_key.nsquare
        out = [
            ((self.n * m + 1) % nsq) * si % nsq
            for m, si in zip(vals, s_ints)
        ]
        return np.array(out, dtype=object)

    def decrypt(self, ciphertexts) -> np.ndarray:
        """Aggregated ciphertexts -> plaintext sums (CRT, device modexp)."""
        cts = [int(c) for c in np.asarray(ciphertexts, dtype=object).ravel()]
        sk = self.privacy_key
        L = self._pair_ctx.L
        cp_host = modmath.to_limbs([c % sk.psquare for c in cts], L)
        cq_host = modmath.to_limbs([c % sk.qsquare for c in cts], L)
        if (self._fanout is not None
                and len(cts) >= 2 * self._fanout.n_shards):

            def job(i, cp_chunk, cq_chunk):
                return self._pair_ctx.exp_pair(cp_chunk, cq_chunk,
                                               self._ep_dev, self._eq_dev)

            xp_np, xq_np = self._fanout.run(job, cp_host, cq_host)
        else:
            xp, xq = self._pair_ctx.exp_pair(
                jnp.asarray(cp_host), jnp.asarray(cq_host),
                self._ep_dev, self._eq_dev)
            xp_np, xq_np = np.asarray(xp), np.asarray(xq)
        xp_ints = modmath.from_limbs(xp_np)
        xq_ints = modmath.from_limbs(xq_np)
        out = []
        for xpi, xqi in zip(xp_ints, xq_ints):
            mp = sk._l(xpi, sk.p) * sk.hp % sk.p
            mq = sk._l(xqi, sk.q) * sk.hq % sk.q
            u = (mp - mq) * sk.q_inverse % sk.p
            out.append((mq + u * sk.q) % self.n)
        return np.array(out, dtype=object)

    def add_ciphertexts(self, ct_arrays) -> np.ndarray:
        """Homomorphic aggregate: elementwise product mod n^2
        (jzf_aggregator.py:437-439).

        Distinct host arrays convert/upload once (id-dedup, with the host
        object kept alive so its id cannot be recycled mid-iteration) and
        the whole Montgomery chain — including the from/to-domain
        conversions — compiles to ONE program: eager per-pair muls pay a
        dispatch round-trip each through a remote tunnel."""
        ctx = self._ctx2
        dev = {}
        seq = []
        for arr in ct_arrays:
            entry = dev.get(id(arr))
            if entry is None:
                ints = [int(c) for c in
                        np.asarray(arr, dtype=object).ravel()]
                d = jnp.asarray(modmath.to_limbs(ints, ctx.L))
                dev[id(arr)] = (arr, d)
            else:
                d = entry[1]
            seq.append(d)
        key = (len(seq), seq[0].shape)
        fn = self._chain_cache.get(key)
        if fn is None:
            def _chain(*xs):
                monts = [modmath.mont_from(ctx, x) for x in xs]
                acc = monts[0]
                for m in monts[1:]:
                    acc = modmath.mont_mul(ctx, acc, m)
                return modmath.mont_to(ctx, acc)

            fn = jax.jit(_chain)
            self._chain_cache[key] = fn
        out = modmath.from_limbs(np.asarray(fn(*seq)))
        return np.array(out, dtype=object)
