"""Package CLI — job submission and utilities.

The analogue of the reference's CLI layer
(fate_flow/fate_flow_client.py:196-225: `python fate_flow_client.py -f
submit_job -d train_job_dsl.json -c train_job_conf.json`); here the DSL
is the model/scheme registry, so one JSON config selects the workload:

    python -m flashe_tpu submit -c examples/configs/mlp_flashe.json
    python -m flashe_tpu submit -c cfg.json --processes   # one OS process
                                                          # per party over
                                                          # the native broker
    python -m flashe_tpu keygen                           # print a PRP seed
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def cmd_submit(args) -> int:
    if args.cpu:
        _force_cpu()
    with open(args.config) as f:
        cfg = json.load(f)

    from flashe_tpu.data import federated_dataset
    from flashe_tpu.runtime.config import HomoNNParam

    param = HomoNNParam.from_dict(cfg["param"])
    n_clients = cfg.get("n_clients", 3)
    shards = federated_dataset(cfg.get("dataset", param.model), n_clients,
                               cfg.get("samples_per_client", 128),
                               seed=cfg.get("seed", 0))

    if args.processes:
        from flashe_tpu.runtime.job import submit_job

        env = {"FLASHE_FORCE_CPU": "1"} if args.cpu else {}
        results = submit_job(param, shards, env_overrides=env,
                             checkpoint_dir=args.checkpoint_dir)
        losses = results["arbiter_0"]["loss_history"]
        phases = results["guest_0"]["phases"]
        transfer = results["guest_0"].get("transfer_stats")
    else:
        from flashe_tpu.nn.homo_nn import (
            HomoNNArbiter, HomoNNGuest, HomoNNHost,
        )
        from flashe_tpu.runtime.simulate import run_roles
        from flashe_tpu.runtime.tracking import tracker

        def guest(trv):
            c = HomoNNGuest(param, seed=0)
            c.fit(trv, *shards[0])
            return {"history": c.history, "phases": tracker().summary()}

        def host(trv, hid):
            c = HomoNNHost(param, seed=1 + hid)
            c.fit(trv, *shards[1 + hid])
            return c.history

        def arbiter(trv):
            return HomoNNArbiter(param).fit(trv)

        results = run_roles(n_clients - 1, guest, host, arbiter)
        losses = results["arbiter"]
        phases = results["guest"]["phases"]
        transfer = None

    out = {
        "loss_per_round": [round(float(v), 6) for v in losses],
        "phases": {k: {"total_s": round(v["total_s"], 4),
                       "count": v["count"]}
                   for k, v in phases.items()},
    }
    if transfer is not None:
        out["guest_transfer"] = transfer
    if args.json:
        print(json.dumps(out))
    else:
        print("mean loss per round:",
              [round(v, 4) for v in out["loss_per_round"]])
        print("guest phase profile:")
        for name, stat in out["phases"].items():
            print(f"  {name:<18} {stat['total_s']:8.3f}s x{stat['count']}")
    return 0


def cmd_predict(args) -> int:
    if args.cpu:
        _force_cpu()
    import numpy as np

    with open(args.config) as f:
        cfg = json.load(f)

    from flashe_tpu.nn.homo_nn import HomoNNGuest
    from flashe_tpu.runtime.config import HomoNNParam

    param = HomoNNParam.from_dict(cfg["param"])
    if args.csv:
        from flashe_tpu.data.io import read_dense_csv

        x, y = read_dense_csv(args.csv,
                              label_index=None if args.unlabeled else 0)
    else:
        from flashe_tpu.data import synthetic_dataset

        x, y = synthetic_dataset(cfg.get("dataset", param.model),
                                 cfg.get("samples_per_client", 128),
                                 seed=cfg.get("seed", 0))

    client = HomoNNGuest(param)
    client.load_model(args.checkpoint, x[:1])
    preds = np.asarray(client.predict(x))
    labels = preds.argmax(axis=-1)
    if args.out:
        np.save(args.out, preds)
    result = {"n": int(len(x)), "aggregate_iter": client.aggregate_iter}
    if y is not None:
        result["accuracy"] = round(float((labels == y).mean()), 4)
    if args.out:
        result["out"] = args.out
    print(json.dumps(result))
    return 0


def cmd_keygen(args) -> int:
    seed = os.urandom(32)
    print(seed.hex())
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m flashe_tpu",
        description="TPU-native FLASHE secure-aggregation framework")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_submit = sub.add_parser(
        "submit", help="run a federated training job from a JSON config")
    p_submit.add_argument("-c", "--config", required=True,
                          help="job config JSON (see examples/configs/)")
    p_submit.add_argument("--processes", action="store_true",
                          help="one OS process per party over the native "
                               "federation broker")
    p_submit.add_argument("--cpu", action="store_true",
                          help="force the CPU backend")
    p_submit.add_argument("--json", action="store_true",
                          help="machine-readable result on stdout")
    p_submit.add_argument("--checkpoint-dir",
                          help="with --processes: each client saves its "
                               "final model there (<role>_<id>.ckpt)")
    p_submit.set_defaults(fn=cmd_submit)

    p_pred = sub.add_parser(
        "predict", help="run predictions with a checkpointed model")
    p_pred.add_argument("-c", "--config", required=True)
    p_pred.add_argument("--checkpoint", required=True,
                        help="checkpoint written by a submit run "
                             "(param.checkpoint) or save_checkpoint")
    p_pred.add_argument("--csv", help="dense CSV to predict on "
                                      "(default: the config's dataset)")
    p_pred.add_argument("--unlabeled", action="store_true",
                        help="the CSV has no label column")
    p_pred.add_argument("--out", help="write raw prediction scores (.npy)")
    p_pred.add_argument("--cpu", action="store_true")
    p_pred.set_defaults(fn=cmd_predict)

    p_key = sub.add_parser("keygen",
                           help="generate a fresh 256-bit PRP seed (hex)")
    p_key.set_defaults(fn=cmd_keygen)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
