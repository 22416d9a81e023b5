"""CKKS baseline cipher (approximate HE for floats).

Replaces the reference's TenSEAL 0.3.1 wrapper
(federatedml/secureprotol/jzf_ckks.py): context(poly_modulus_degree,
global_scale=2^40), SYMMETRIC encryption, vector encrypt / decrypt and
ciphertext addition — the only operations the aggregation pipeline uses
(jzf_aggregator.py:445-448; note the CKKS block skips quantization and
ships floats, jzf_ckks_block.py:84-94).

Design: canonical-embedding encode/decode run on host in float64 (there is
no f64 on TPU and encode precision sets the scheme's accuracy — same split
as the reference, where encoding lives in C++ on host), while all ring
arithmetic (NTT, s*c1, ct adds) runs as JAX RNS tensors.  Slots use the
standard 5^j orbit ordering, so slotwise addition is exact under the
embedding.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from flashe_tpu.ops import ntt as nttmod

__all__ = ["CKKSCipher"]


def _k_for_degree(m: int) -> int:
    return {1024: 2, 2048: 2, 4096: 4, 8192: 6}.get(m, 6)


class CKKSCipher:
    def __init__(self, poly_modulus_degree: int = 8192,
                 coeff_mod_bit_sizes=None, global_scale: float = 2.0 ** 40,
                 seed: int | None = None):
        self.N = int(poly_modulus_degree)
        self.slots = self.N // 2
        self.scale = float(global_scale)
        self.k = _k_for_degree(self.N)
        primes = nttmod.find_ntt_primes(self.k, 30, 2 * self.N)
        self.ctx = nttmod.RnsContext(self.N, primes)
        self.q = self.ctx.q
        self._rng = np.random.RandomState(seed)
        import jax as _jax

        self._enc_key = _jax.random.PRNGKey(
            int(self._rng.randint(0, 2**31 - 1)))
        self._enc_cache: dict = {}
        self.sk_ntt = None
        self.sk_coeffs = None
        self._fanout = None

        # canonical embedding via FFT: evaluation at zeta^(5^i) maps to
        # DFT bin k_i = (5^i - 1)/2 after a zeta^j pre-twist; conjugate
        # roots land at bins N-1-k_i.  O(N log N), O(N) memory.
        r = np.empty(self.slots, np.int64)
        cur = 1
        for j in range(self.slots):
            r[j] = cur
            cur = (cur * 5) % (2 * self.N)
        self._bins = ((r - 1) // 2).astype(np.int64)
        self._twist = np.exp(1j * np.pi * np.arange(self.N) / self.N)

        self._add_cache: dict = {}
        # vectorized centered-CRT decode constants (see decrypt): c_i =
        # |v_i * inv_i|_{p_i}; coeff == (sum_i c_i*(q/p_i) - A*q) exactly,
        # recovered mod 2^64 (coeffs are ~scale-sized, far below 2^63)
        self._crt_p = np.array(self.ctx.primes, np.uint64)
        self._crt_inv = np.array(
            [pow((self.q // p) % p, -1, p) for p in self.ctx.primes],
            np.uint64)
        self._crt_qi64 = np.array(
            [(self.q // p) % (1 << 64) for p in self.ctx.primes], np.uint64)
        self._q64 = np.uint64(self.q % (1 << 64))

    def set_local_devices(self, n_shards=None, devices=None):
        """Fan this party's ciphertext batch over its local devices (the
        reference parallelizes every scheme per silo; parallel/fanout.py):
        rows are independent, chunks dispatch concurrently.  A 1-device
        fan-out disables the route."""
        from flashe_tpu.parallel.fanout import DeviceFanout

        f = DeviceFanout(n_shards, devices)
        self._fanout = f if f.n_shards > 1 else None

    # -- keys --------------------------------------------------------------

    def generate_keys(self):
        rng = self._rng
        s = rng.randint(-1, 2, self.N).astype(np.int64)
        self.sk_coeffs = s
        self.sk_ntt = nttmod.ntt(self.ctx, jnp.asarray(self._to_res(s)))
        return self

    def serialize_secret(self) -> bytes:
        return self.sk_coeffs.astype(np.int8).tobytes()

    def load_secret(self, blob: bytes):
        s = np.frombuffer(blob, np.int8).astype(np.int64)
        self.sk_coeffs = s
        self.sk_ntt = nttmod.ntt(self.ctx, jnp.asarray(self._to_res(s)))
        return self

    # -- residue helpers ---------------------------------------------------

    def _to_res(self, coeffs) -> np.ndarray:
        coeffs = np.asarray(coeffs)
        out = np.empty(coeffs.shape[:-1] + (self.k, self.N), np.uint32)
        if coeffs.dtype == object:
            for ki, p in enumerate(self.ctx.primes):
                flat = coeffs.reshape(-1, self.N)
                res = np.empty(flat.shape, np.uint32)
                for b in range(flat.shape[0]):
                    res[b] = np.array(
                        [int(c) % p for c in flat[b]], np.uint32)
                out[..., ki, :] = res.reshape(coeffs.shape[:-1] + (self.N,))
        else:
            for ki, p in enumerate(self.ctx.primes):
                out[..., ki, :] = np.mod(coeffs.astype(np.int64), p).astype(
                    np.uint32)
        return out

    # -- encode / decode (host, float64) -----------------------------------

    def _encode(self, values: np.ndarray) -> np.ndarray:
        """(B, slots) floats -> (B, N) int64 coeffs (scaled).

        Batched FFT + int64 rounding (scaled coeffs are far below 2^62
        for any sane scale/value range; the previous per-coefficient
        Python object-int loop dominated encrypt wall time)."""
        v = np.asarray(values, np.float64)
        B = v.shape[0]
        spec_full = np.zeros((B, self.N), np.complex128)
        spec_full[:, self._bins] = v
        spec_full[:, self.N - 1 - self._bins] = np.conj(
            v.astype(np.complex128))
        coeffs = (np.fft.fft(spec_full, axis=-1) / self.N /
                  self._twist).real
        return np.rint(coeffs * self.scale).astype(np.int64)

    def _decode(self, coeffs: np.ndarray) -> np.ndarray:
        """(B, N) int64/float coeffs -> (B, slots) floats (batched)."""
        c = np.asarray(coeffs).astype(np.float64)
        evals = np.fft.ifft(c * self._twist, axis=-1) * self.N
        return evals[:, self._bins].real / self.scale

    # -- encrypt / decrypt / add ------------------------------------------

    def encrypt(self, values: np.ndarray) -> np.ndarray:
        """(n,) floats -> (B, 2, k, N) symmetric ciphertexts."""
        vals = np.asarray(values, np.float64).ravel()
        n_ct = -(-len(vals) // self.slots)
        padded = np.zeros(n_ct * self.slots, np.float64)
        padded[: len(vals)] = vals
        pt = self._encode(padded.reshape(n_ct, self.slots))
        return self._encrypt_polys(pt)

    def _encrypt_polys(self, pt: np.ndarray) -> np.ndarray:
        """(B, N) int64 scaled coeffs -> (B, 2, k, N) ciphertexts.

        The coeffs ship as two uint32 planes (lo, hi of coeff + 2^62)
        and the per-prime residue expansion happens in-jit: uploading
        precomputed (B, k, N) residues cost k/2 = 3x the bytes — the
        dominant encrypt cost through a remote-TPU tunnel.
        """
        import jax

        fn = self._enc_cache.get("enc")
        if fn is None:
            ctx, N, k = self.ctx, self.N, self.k
            primes = [int(p) for p in ctx.primes]
            # constants for the in-jit residue expansion
            c32 = jnp.asarray(np.array(
                [(1 << 32) % p for p in primes], np.uint32))[:, None]
            bias = jnp.asarray(np.array(
                [(1 << 62) % p for p in primes], np.uint32))[:, None]

            def run(key, lo, hi, sk_ntt):
                B = lo.shape[0]
                # residues of coeff = hi*2^32 + lo - 2^62, per prime
                pk = ctx.p.astype(jnp.uint32)  # (k, 1)
                lo_r = lo[:, None, :] % pk[None]
                hi_r = hi[:, None, :] % pk[None]
                m_res = ctx.sub(
                    ctx.add(ctx.mul(hi_r, jnp.broadcast_to(
                        c32, (k, N))), lo_r),
                    jnp.broadcast_to(bias, (k, N)))
                keys = jax.random.split(key, k + 1)
                a = jnp.stack([
                    jax.random.randint(keys[i], (B, N), 0, primes[i],
                                       dtype=jnp.int32).astype(jnp.uint32)
                    for i in range(k)
                ], axis=1)  # (B, k, N) uniform in R_q via CRT
                e = jnp.clip(jnp.round(
                    jax.random.normal(keys[k], (B, N)) * 3.2), -19, 19
                ).astype(jnp.int32)
                ee = e[:, None, :]
                p_i = ctx.p.astype(jnp.int32)[None]
                e_res = jnp.where(ee < 0, ee + p_i, ee).astype(jnp.uint32)
                a_ntt = nttmod.ntt(ctx, a)
                e_ntt = nttmod.ntt(ctx, e_res)
                m_ntt = nttmod.ntt(ctx, m_res)
                c0 = ctx.add(ctx.neg(ctx.mul(a_ntt, sk_ntt)),
                             ctx.add(e_ntt, m_ntt))
                return jnp.stack([c0, a_ntt], axis=1)

            fn = jax.jit(run)
            self._enc_cache["enc"] = fn
        self._enc_key, sub = jax.random.split(self._enc_key)
        biased = np.asarray(pt, np.int64) + (1 << 62)
        lo_host = (biased & 0xFFFFFFFF).astype(np.uint32)
        hi_host = (biased >> 32).astype(np.uint32)
        B = lo_host.shape[0]
        if (self._fanout is not None
                and B >= 2 * self._fanout.n_shards):
            sk = self.sk_ntt
            subs = jax.random.split(sub, self._fanout.n_shards)
            return self._fanout.run(
                lambda i, lo_c, hi_c: fn(subs[i], lo_c, hi_c, sk),
                lo_host, hi_host)
        out = fn(sub, jnp.asarray(lo_host), jnp.asarray(hi_host),
                 self.sk_ntt)
        # stays on device (see bfv.encrypt_polys): adds/decrypt consume it
        # directly; np.asarray at the wire boundary only
        return out

    def decrypt(self, cts, count: int) -> np.ndarray:
        coeffs = np.asarray(self._decrypt_coeff_f32(cts))
        return self._decode(coeffs).reshape(-1)[:count]

    @staticmethod
    def _mul64(a, b_lo, b_hi):
        """(a * (b_hi<<32 | b_lo)) mod 2^64 as uint32 (lo, hi) planes.

        a: uint32 tensor; b_*: uint32 constants/tensors.  Classic 16-bit
        mulhi decomposition (XLA has no unsigned mulhi)."""
        a0 = a & 0xFFFF
        a1 = a >> 16
        b0 = b_lo & 0xFFFF
        b1 = b_lo >> 16
        t0 = a0 * b0
        t1 = a1 * b0 + (t0 >> 16)
        t2 = a0 * b1 + (t1 & 0xFFFF)
        hi = a1 * b1 + (t1 >> 16) + (t2 >> 16)
        lo = (t2 << 16) | (t0 & 0xFFFF)
        hi = hi + a * b_hi  # wrapping: only mod-2^32 of the high part
        return lo, hi

    def _decrypt_coeff_f32(self, cts):
        """(B, 2, k, N) cts -> (B, N) float32 centered coeffs, on device:
        intt + per-prime CRT digits + the mod-2^64 centered
        reconstruction in uint32 pair arithmetic.  Downloading one f32
        plane instead of k uint32 residue planes cuts decrypt transfer
        6x; float32 coeff error is ~|coeff|*6e-8 -> ~1e-6 per decoded
        slot after /scale — far inside CKKS's own approximation budget.
        (The final inverse-FFT decode stays on host: this TPU backend
        has no complex FFT lowering.)"""
        cts = jnp.asarray(cts)
        fn = self._add_cache.get("deccoef")
        if fn is None:
            ctx, k, N = self.ctx, self.k, self.N
            inv = jnp.asarray(
                self._crt_inv.astype(np.uint32))[:, None]  # (k,1)
            p_f = jnp.asarray(
                self._crt_p.astype(np.float32))[:, None]
            qi_lo = jnp.asarray(
                (self._crt_qi64 & np.uint64(0xFFFFFFFF)).astype(
                    np.uint32))
            qi_hi = jnp.asarray(
                (self._crt_qi64 >> np.uint64(32)).astype(np.uint32))
            q_lo = jnp.uint32(int(self._q64) & 0xFFFFFFFF)
            q_hi = jnp.uint32(int(self._q64) >> 32)

            def run(cts, sk):
                v = nttmod.intt(ctx, ctx.add(
                    cts[:, 0], ctx.mul(cts[:, 1], sk)))  # (B,k,N)
                c = ctx.mul(v, jnp.broadcast_to(inv, (k, N)))
                A = jnp.rint(
                    (c.astype(jnp.float32) / p_f[None]).sum(axis=1)
                ).astype(jnp.uint32)  # (B,N)
                acc_lo = jnp.zeros(c.shape[::2], jnp.uint32)  # (B,N)
                acc_hi = jnp.zeros_like(acc_lo)
                for i in range(k):
                    lo, hi = self._mul64(c[:, i], qi_lo[i], qi_hi[i])
                    new_lo = acc_lo + lo
                    carry = (new_lo < lo).astype(jnp.uint32)
                    acc_lo = new_lo
                    acc_hi = acc_hi + hi + carry
                s_lo, s_hi = self._mul64(A, q_lo, q_hi)
                res_lo = acc_lo - s_lo
                borrow = (acc_lo < s_lo).astype(jnp.uint32)
                res_hi = acc_hi - s_hi - borrow
                coeff = (jax.lax.bitcast_convert_type(
                    res_hi, jnp.int32).astype(jnp.float32) * 4294967296.0
                    + res_lo.astype(jnp.float32))  # centered, approx
                return coeff

            fn = jax.jit(run)
            self._add_cache["deccoef"] = fn
        if (self._fanout is not None
                and cts.shape[0] >= 2 * self._fanout.n_shards):
            sk = self.sk_ntt
            return self._fanout.run(
                lambda i, ct_chunk: fn(ct_chunk, sk), cts)
        return fn(cts, self.sk_ntt)

    def encrypt_no_batch(self, values: np.ndarray) -> np.ndarray:
        """One value per ciphertext in slot 0 (the reference's _no_batch
        variants, jzf_ckks.py:60-84) — the pathological-inflation row of
        the comparison table."""
        vals = np.asarray(values, np.float64).ravel()
        pts = np.zeros((len(vals), self.slots), np.float64)
        pts[:, 0] = vals
        pt = self._encode(pts)
        return self._encrypt_polys(pt)

    def decrypt_no_batch(self, cts, count: int) -> np.ndarray:
        """Slot 0 of each ciphertext, batched decode."""
        coeffs = np.asarray(self._decrypt_coeff_f32(cts))
        return self._decode(coeffs)[:, 0][:count]

    def add_ciphertexts(self, ct_arrays):
        """Ciphertext aggregate: one jitted chain of residue adds,
        device-resident end to end (see BFVCipher.add_ciphertexts for the
        upload-dedup/id-liveness notes)."""
        dev = {}
        seq = []
        for ct in ct_arrays:
            entry = dev.get(id(ct))
            if entry is None:
                d = ct if isinstance(ct, jax.Array) else jnp.asarray(
                    np.asarray(ct))
                dev[id(ct)] = (ct, d)
            else:
                d = entry[1]
            seq.append(d)
        if len(seq) == 1:
            return seq[0]
        fn = self._add_cache.get(len(seq))
        if fn is None:
            ctx = self.ctx
            fn = jax.jit(lambda *xs: functools.reduce(ctx.add, xs))
            self._add_cache[len(seq)] = fn
        return fn(*seq)
