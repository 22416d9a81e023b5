"""Convergence-parity experiment on the reference's real dataset.

Trains the Shakespeare next-char GRU (the reference's lstm_* workload:
Embedding 83->512 mask_zero, GRU 256 return_sequences, Dense 83 — the
nn_define of examples/configs/lstm_flashe_q16_b1_pad) federatedly over
9 clients + arbiter with secure aggregation, under both `flashe` and
`plain`, and reports:

- per-round federated train loss and held-out (b.csv) loss/accuracy,
- per-round wall time per scheme -> the flashe-vs-plaintext overhead
  (the reference claims <=6% time overhead, README.md:21),
- a results JSON + markdown table (docs/CONVERGENCE.md via --write-docs).

Usage (full run is hours on CPU; use the TPU chip or --small):

    python examples/shakespeare_experiment.py --rounds 20 --cpu --small
    python examples/shakespeare_experiment.py --rounds 20   # real chip
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def gru_define(embed: int, hidden: int, vocab: int = 83,
               seq_len: int = 80) -> dict:
    """The reference LSTM-workload architecture as an nn_define dict
    (equivalent to lstm_flashe_q16_b1_pad's, parameterized so --small
    can shrink it)."""
    return {
        "class_name": "Sequential",
        "config": {
            "name": "lstm",
            "layers": [
                {"class_name": "Embedding",
                 "config": {"name": "embedding", "input_dim": vocab,
                            "output_dim": embed, "mask_zero": True,
                            "input_length": seq_len}},
                {"class_name": "GRU",
                 "config": {"name": "gru", "units": hidden,
                            "return_sequences": True}},
                {"class_name": "Dense",
                 "config": {"name": "dense", "units": vocab,
                            "activation": "linear"}},
            ],
        },
    }


def run_scheme(scheme, shards, eval_xy, define, rounds, lr, batch_size,
               n_hosts):
    """One federated training run; returns the guest's record dict."""
    import jax.numpy as jnp

    from flashe_tpu.nn.models import build_model, init_params
    from flashe_tpu.nn.trainer import LocalTrainer
    from flashe_tpu.nn.weights import WeightsCodec
    from flashe_tpu.protocol import aggregator
    from flashe_tpu.runtime.simulate import run_roles

    args = {
        "quantize": {"int_bits": 20, "batch": False, "element_bits": 16,
                     "padding": True, "secure": True},
        "precompute": {"enable": scheme == "flashe"},
        "mode": "parallel", "num_partitions": 1,
    }
    xe, ye = eval_xy

    def client_loop(agg, x, y, seed, record_eval):
        model = build_model("nn_define", nn_define=define)
        params = init_params(model, jnp.asarray(x[:1]), seed=0)
        codec = WeightsCodec(params)
        agg.set_codec(codec)
        trainer = LocalTrainer(model, params, optimizer="adam",
                               learning_rate=lr, seed=seed,
                               label_pad_id=0)
        degree = float(len(x))
        rec = {"train_loss": [], "eval_loss": [], "eval_acc": [],
               "round_s": []}
        for r in range(rounds):
            t0 = time.perf_counter()
            tl = trainer.train(x, y, epochs=1,
                               batch_size=min(batch_size, len(x)))
            flat = codec.flatten(trainer.params)
            out = agg.aggregate_then_get(flat, iter_index=r, degree=degree,
                                         suffix=(r,))
            trainer.set_model_weights(codec.unflatten(out))
            agg.send_loss(tl * degree, degree=degree, suffix=(r,))
            agg.get_converge_status(suffix=(r, "conv"))
            rec["round_s"].append(time.perf_counter() - t0)
            rec["train_loss"].append(float(tl))
            if record_eval:
                el, ea = trainer.evaluate(xe, ye)
                rec["eval_loss"].append(float(el))
                rec["eval_acc"].append(float(ea))
                print(f"  [{scheme}] round {r}: train={tl:.4f} "
                      f"eval={el:.4f} acc={ea:.4f} "
                      f"({rec['round_s'][-1]:.1f}s)", flush=True)
        return rec

    def guest(trv):
        agg = aggregator.Guest().register_aggregator(
            trv, secure_aggregate=scheme, secure_aggregate_args=args)
        x, y = shards[0]
        return client_loop(agg, x, y, seed=0, record_eval=True)

    def host(trv, hid):
        agg = aggregator.Host().register_aggregator(
            trv, secure_aggregate=scheme, secure_aggregate_args=args)
        x, y = shards[1 + hid]
        return client_loop(agg, x, y, seed=1 + hid, record_eval=False)

    def arbiter(trv):
        agg = aggregator.Arbiter().register_aggregator(
            trv, secure_aggregate=scheme, secure_aggregate_args=args)
        losses = []
        for r in range(rounds):
            agg.aggregate_and_broadcast(iter_index=r, suffix=(r,))
            losses.append(agg.aggregate_loss(suffix=(r,)))
            agg.send_converge_status(lambda: False, (), suffix=(r, "conv"))
        return losses

    results = run_roles(n_hosts, guest, host, arbiter)
    rec = results["guest"]
    rec["fed_loss"] = results["arbiter"]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default=None,
                    help="shakespeare_10 root (default: the reference's)")
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--schemes", default="plain,flashe")
    ap.add_argument("--clients", type=int, default=9)
    ap.add_argument("--limit", type=int, default=None,
                    help="rows per client shard")
    ap.add_argument("--eval-limit", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--learning-rate", type=float, default=0.01)
    ap.add_argument("--small", action="store_true",
                    help="embed 64 / GRU 64 instead of 512/256")
    ap.add_argument("--reps", type=int, default=1,
                    help="paired repetitions: schemes alternate per rep "
                         "(plain, flashe, plain, flashe, ...) so drift "
                         "hits both arms; overhead reported as mean "
                         "+/- spread over the pairs")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="examples/shakespeare_results.json")
    ap.add_argument("--write-docs", action="store_true",
                    help="render docs/CONVERGENCE.md from the results")
    args = ap.parse_args()

    from flashe_tpu import jaxenv

    jaxenv.setup(force_cpu=args.cpu)

    from flashe_tpu.data import shakespeare

    root = args.dataset or shakespeare.DEFAULT_ROOT
    shards = shakespeare.load_clients(root, args.clients, args.limit)
    eval_xy = shakespeare.load_eval(root, args.eval_limit)
    sizes = [len(x) for x, _ in shards]
    print(f"clients={len(shards)} shard sizes={sizes} "
          f"eval={len(eval_xy[0])}")

    define = (gru_define(64, 64) if args.small else gru_define(512, 256))
    from flashe_tpu.nn.keras_define import KerasDefineModel, \
        count_params_define
    import json as _json

    n_params = count_params_define(
        KerasDefineModel(_json.dumps(define)),
        np.zeros((1, 80), np.int32))
    print(f"model parameters: {n_params:,}")

    out = {"config": {"rounds": args.rounds, "small": args.small,
                      "clients": args.clients, "params": n_params,
                      "batch_size": args.batch_size,
                      "learning_rate": args.learning_rate,
                      "reps": args.reps},
           "schemes": {}}
    schemes = args.schemes.split(",")
    for rep in range(args.reps):
        # alternate arm order per rep: both arms share one process, so
        # the second arm always inherits warm XLA compiles / allocator
        # state — a fixed order would bias the comparison toward
        # whichever scheme runs second
        order = schemes if rep % 2 == 0 else list(reversed(schemes))
        for scheme in order:
            print(f"== scheme {scheme} (rep {rep + 1}/{args.reps})")
            rec = run_scheme(scheme, shards, eval_xy, define, args.rounds,
                             args.learning_rate, args.batch_size,
                             n_hosts=len(shards) - 1)
            # drop round 0 from the time stats (XLA compile)
            steady = rec["round_s"][1:] or rec["round_s"]
            mean_s = float(np.mean(steady))
            if rep == 0:
                rec["mean_round_s"] = mean_s
                rec["mean_round_s_reps"] = [mean_s]
                rec["round_s_reps"] = [list(map(float, steady))]
                out["schemes"][scheme] = rec
            else:
                out["schemes"][scheme]["mean_round_s_reps"].append(mean_s)
                out["schemes"][scheme]["round_s_reps"].append(
                    list(map(float, steady)))

    if {"plain", "flashe"} <= set(out["schemes"]):
        out.update(overhead_stats(out["schemes"]["plain"],
                                  out["schemes"]["flashe"]))
        print(f"flashe vs plain round time: overhead median "
              f"{out['flashe_overhead_pct']}% "
              f"[{out['flashe_overhead_ci'][0]}%, "
              f"{out['flashe_overhead_ci'][1]}%] 95% CI over "
              f"{out['flashe_overhead_n_pairs']} round pairs "
              f"(rep-level pairs: {out['flashe_overhead_reps']})")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    if args.write_docs:
        write_docs(out)


def overhead_stats(pl: dict, fl: dict) -> dict:
    """Round-level paired overhead statistics.

    The shared remote-TPU tunnel drifts at the minutes scale, so
    rep-level means swing +/-30% and run-level pairing cannot cancel it.
    Round r of the two arms within one rep runs ~40 s apart, so the
    per-round ratio (tf_r - tp_r)/tp_r is drift-paired; with R rounds x
    N reps there are R*N such pairs.  The reported figure is their
    MEDIAN (robust to the tunnel's multi-second stalls on individual
    rounds) with a 95% bootstrap confidence interval, plus the rep-level
    pairs for transparency."""
    tps_all = pl.get("round_s_reps") or [pl["round_s"][1:]]
    tfs_all = fl.get("round_s_reps") or [fl["round_s"][1:]]
    ratios = []
    for tp_r, tf_r in zip(tps_all, tfs_all):
        for tp, tf in zip(tp_r, tf_r):
            ratios.append(100.0 * (tf - tp) / tp)
    ratios = np.asarray(ratios)
    med = float(np.median(ratios))
    rng = np.random.RandomState(0)
    boots = [float(np.median(ratios[rng.randint(0, len(ratios),
                                                len(ratios))]))
             for _ in range(2000)]
    lo, hi = np.percentile(boots, [2.5, 97.5])
    rep_ohs = [100.0 * (np.mean(tf_r) - np.mean(tp_r)) / np.mean(tp_r)
               for tp_r, tf_r in zip(tps_all, tfs_all)]
    return {
        "flashe_overhead_pct": round(med, 2),
        "flashe_overhead_ci": [round(float(lo), 2), round(float(hi), 2)],
        "flashe_overhead_n_pairs": len(ratios),
        "flashe_overhead_reps": [round(float(o), 2) for o in rep_ohs],
    }


def write_docs(out):
    """Render docs/CONVERGENCE.md from a results dict (the committed
    artifact for the reference's accuracy-parity / <=6%-overhead claims,
    README.md:21)."""
    cfg = out["config"]
    scale = "toy (--small)" if cfg["small"] else "full reference scale"
    lines = [
        "# Convergence: Shakespeare next-char GRU, flashe vs plain",
        "",
        "Real-data federated training on the reference's in-repo "
        "`shakespeare_10` dataset (examples/shakespeare_experiment.py): "
        f"{cfg['clients']} clients + arbiter, {cfg['params']:,}-param "
        "GRU (the lstm_flashe_q16_b1_pad nn_define), "
        f"{cfg['rounds']} rounds, batch {cfg['batch_size']}, Adam "
        f"lr={cfg['learning_rate']} — **{scale}**.",
        "",
        "| Round | plain eval loss | plain acc | flashe eval loss "
        "| flashe acc |",
        "|---|---|---|---|---|",
    ]
    pl = out["schemes"].get("plain", {})
    fl = out["schemes"].get("flashe", {})
    n_rounds = max(len(pl.get("eval_loss", [])),
                   len(fl.get("eval_loss", [])))
    for r in range(n_rounds):
        def g(rec, k):
            v = rec.get(k, [])
            return f"{v[r]:.4f}" if r < len(v) else "—"
        lines.append(f"| {r} | {g(pl, 'eval_loss')} | {g(pl, 'eval_acc')} "
                     f"| {g(fl, 'eval_loss')} | {g(fl, 'eval_acc')} |")
    if "flashe_overhead_pct" in out:
        import numpy as _np

        tps = pl.get("mean_round_s_reps", [pl.get("mean_round_s")])
        tfs = fl.get("mean_round_s_reps", [fl.get("mean_round_s")])
        oh = out["flashe_overhead_pct"]
        ci = out.get("flashe_overhead_ci")
        reps = out.get("flashe_overhead_reps", [oh])
        if ci and out.get("flashe_overhead_n_pairs", 0) > len(reps):
            verdict = ("comfortably inside" if ci[1] <= 6.0 else
                       "inside" if oh <= 6.0 else "OUTSIDE")
            lines += [
                "",
                f"Round time (steady state, round 0 excluded; "
                f"{len(reps)} interleaved plain/flashe reps, arm order "
                f"alternating per rep so warm-process bias cancels): "
                f"plain "
                f"{_np.mean(tps):.3f} s, flashe {_np.mean(tfs):.3f} s "
                f"-> overhead **{oh:+.2f}%**, 95% bootstrap CI "
                f"[{ci[0]:+.2f}%, {ci[1]:+.2f}%] over "
                f"{out['flashe_overhead_n_pairs']} round-level pairs "
                f"(median of per-round paired ratios — round r of the "
                f"two arms runs ~40 s apart, pairing out the shared "
                f"tunnel's minutes-scale drift that makes rep-level "
                f"means swing: per-rep overheads "
                f"{', '.join(f'{o:+.1f}%' for o in reps)}).  The CI is "
                f"{verdict} the reference's <=6% claim "
                f"(README.md:21).",
            ]
        else:
            lines += [
                "",
                f"Round time (steady state, round 0 excluded): plain "
                f"{tps[0]:.3f} s, flashe {tfs[0]:.3f} s -> overhead "
                f"**{oh}%** (single pair — run --reps 3 for error "
                f"bars; reference claim: <=6%, README.md:21).",
            ]
    lines += ["", "Raw data: `examples/shakespeare_results.json`.", ""]
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "CONVERGENCE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
