"""FLASHE-TPU headline benchmark: encrypted-gradient round throughput.

Measures one full 10-client FLASHE round on a single chip — quantized
uint32 lanes through encrypt, 10-ciphertext modular aggregation, and
boundary-mask decrypt — and reports elements/sec/chip.

Baseline (BASELINE.md section 1, reference notebook cell 30 on c5.4xlarge,
16 vCPU, int_bits=20): at 262,144 elements FLASHE takes 2.42 s encrypt +
7.33 s add(10 cts) + 2.42 s decrypt = 12.17 s -> 21,540 elements/s for the
enc+agg+dec critical path.  vs_baseline = ours / 21,540.

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_ELEMENTS_PER_SEC = 262_144 / (2.42 + 7.33 + 2.42)  # 21,540/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=4_194_304,
                    help="gradient vector length (default 4M)")
    ap.add_argument("--clients", type=int, default=10)
    ap.add_argument("--int-bits", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--impl", choices=["xla", "pallas"], default="xla",
                    help="encrypt/decrypt kernel implementation")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flashe_tpu.ops import aes
    from flashe_tpu.ops.lanes import lane_add, lane_sub
    from flashe_tpu.ops.masks import prp_lane_stream

    n, c, m = args.elements, args.clients, args.int_bits
    rk = jnp.asarray(aes.key_schedule(bytes(range(32))).astype(np.int32))
    mask = np.uint32((1 << m) - 1)

    if args.impl == "pallas":
        from flashe_tpu.ops import pallas_flashe as pf

        def encrypt(q, it, idx):
            return pf.pallas_mask_apply(q, rk, it, idx, idx + 1, m)

        def decrypt(agg, it):
            return pf.pallas_mask_apply(agg, rk, it, c, 0, m)
    else:
        @jax.jit
        def encrypt(q, it, idx):
            add = prp_lane_stream(rk, it, idx, n, m)
            minus = prp_lane_stream(rk, it, idx + 1, n, m)
            return (q + add - minus) & mask

        @jax.jit
        def decrypt(agg, it):
            add = prp_lane_stream(rk, it, c, n, m)
            minus = prp_lane_stream(rk, it, 0, n, m)
            return (agg + add - minus) & mask

    @jax.jit
    def aggregate(cts):
        # exact for clients * 2^int_bits <= 2^32 (here 10 * 2^20)
        return jnp.sum(cts, axis=0, dtype=jnp.uint32) & mask

    rng = np.random.RandomState(0)
    q = jnp.asarray(
        rng.randint(0, 1 << 16, (c, n), dtype=np.int64).astype(np.uint32))

    def round_fn(it):
        cts = jnp.stack([encrypt(q[i], it, jnp.int32(i)) for i in range(c)])
        agg = aggregate(cts)
        return decrypt(agg, it)

    # warmup / compile
    out = round_fn(jnp.int32(0))
    out.block_until_ready()

    # correctness guard: decrypted aggregate == mod-2^m sum
    want = np.asarray(q, np.int64).sum(axis=0) % (1 << m)
    got = np.asarray(out, np.int64)
    assert np.array_equal(got[:4096], want[:4096]), "round mismatch"

    # timed phases (fresh iter index each rep to avoid caching artifacts)
    t_enc = t_agg = t_dec = 0.0
    for r in range(1, args.reps + 1):
        it = jnp.int32(r)
        t0 = time.perf_counter()
        cts = [encrypt(q[i], it, jnp.int32(i)) for i in range(c)]
        cts[0].block_until_ready()
        jax.block_until_ready(cts)
        t1 = time.perf_counter()
        agg = aggregate(jnp.stack(cts))
        agg.block_until_ready()
        t2 = time.perf_counter()
        dec = decrypt(agg, it)
        dec.block_until_ready()
        t3 = time.perf_counter()
        t_enc += t1 - t0
        t_agg += t2 - t1
        t_dec += t3 - t2

    t_enc /= args.reps
    t_agg /= args.reps
    t_dec /= args.reps
    # critical path comparable to the reference table: one client's encrypt
    # + the 10-ct aggregate + decrypt
    round_s = t_enc / c + t_agg + t_dec
    eps = n / round_s
    result = {
        "metric": "flashe_enc_agg_dec_elements_per_sec_per_chip",
        "value": round(eps, 1),
        "unit": "elements/s",
        "vs_baseline": round(eps / BASELINE_ELEMENTS_PER_SEC, 2),
    }
    if args.verbose:
        result["detail"] = {
            "elements": n,
            "clients": c,
            "int_bits": m,
            "t_encrypt_all_clients_s": round(t_enc, 4),
            "t_aggregate_s": round(t_agg, 4),
            "t_decrypt_s": round(t_dec, 4),
            "device": str(jax.devices()[0]),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
