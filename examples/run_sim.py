"""Run a federated training job from a JSON config.

The example-harness analogue of the reference's
`fate_flow_client.py -f submit_job -d DSL -c CONF`: pick a config from
examples/configs/, simulate the parties in-process (threads) or as real
subprocesses over the TCP broker (--processes).

    python examples/run_sim.py examples/configs/cnn_flashe_q16_b1_pad.json
    python examples/run_sim.py examples/configs/mlp_flashe.json --processes
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--processes", action="store_true",
                    help="run each party as its own OS process over TCP")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

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
        results = submit_job(param, shards, env_overrides=env)
        losses = results["arbiter_0"]["loss_history"]
        phases = results["guest_0"]["phases"]
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

    print("mean loss per round:", [round(v, 4) for v in losses])
    print("guest phase profile:")
    for name, stat in phases.items():
        print(f"  {name:<18} {stat['total_s']:8.3f}s x{stat['count']}")


if __name__ == "__main__":
    main()
