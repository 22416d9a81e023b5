"""Multi-host cluster deployment: conf parsing, command planning, and a
full run-local execution (broker CLI + one party CLI per machine-slot).

The deployment/ analogue (SURVEY.md section 1 layer 13): the reference
provisions EC2 machines per role; here a cluster conf expands into one
`python -m flashe_tpu party` command per silo, all dialing one broker.
"""

import json
import os
import pickle

import numpy as np
import pytest

from flashe_tpu.runtime.cluster import (
    build_party_cfg, load_cluster_conf, party_roles, plan_commands,
    run_local,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_example_cluster_conf_plans():
    conf = load_cluster_conf(os.path.join(REPO, "deploy/cluster_conf.yml"))
    plan = plan_commands(conf, os.path.join(REPO, "deploy"))
    # 1 broker + guest + 2 hosts + arbiter
    assert set(plan) == {"broker", "guest_0", "host_0", "host_1",
                         "arbiter_0"}
    assert plan["broker"]["host"] == "10.0.0.1"
    assert "--broker 10.0.0.1:9370" in plan["host_1"]["cmd"]
    assert "--party-id 1" in plan["host_1"]["cmd"]
    assert "--job-id femnist-flashe-1" in plan["guest_0"]["cmd"]
    assert "--data-root /srv/flashe/data" in plan["guest_0"]["cmd"]
    assert conf["runner"] == "ssh {host} {cmd}"
    assert [r for r, _, _ in party_roles(conf)] == [
        "guest", "host", "host", "arbiter"]


def test_build_party_cfg_dsl_and_validation():
    with open(os.path.join(REPO, "examples/dsl/train_job_dsl.json")) as f:
        dsl = json.load(f)
    with open(os.path.join(REPO, "examples/dsl/train_job_conf.json")) as f:
        conf = json.load(f)
    cfg = build_party_cfg("host", 1, ("10.0.0.1", 9370), "jid",
                          dsl=dsl, conf=conf, data_root="/d")
    assert cfg["kind"] == "dsl" and cfg["ordinal"] == 1
    assert cfg["n_hosts"] == 2 and cfg["data_root"] == "/d"
    assert cfg["seed"] == 2  # guest=0, host h=1+h (runtime/job.py order)
    with pytest.raises(ValueError):
        build_party_cfg("host", 5, ("h", 1), "jid", dsl=dsl, conf=conf)
    with pytest.raises(ValueError):
        build_party_cfg("guest", 0, ("h", 1), "jid")  # neither dsl nor param


@pytest.mark.slow
def test_cluster_run_local(tmp_path):
    from flashe_tpu.data import federated_dataset

    shards = federated_dataset("mlp", 2, 64, seed=0)
    for i, (x, y) in enumerate(shards):
        np.savez(tmp_path / f"c{i}.npz", x=x, y=y)
    job_cfg = {
        "param": {
            "model": "mlp",
            "model_kwargs": {"features": [8, 10]},
            "secure_aggregate": "flashe",
            "secure_aggregate_args": {
                "quantize": {"int_bits": 20, "element_bits": 16}},
            "max_iter": 1,
            "batch_size": 32,
            "learning_rate": 0.005,
        },
        "n_clients": 2,
    }
    with open(tmp_path / "job.json", "w") as f:
        json.dump(job_cfg, f)
    outs = {r: str(tmp_path / f"{r}.out")
            for r in ("guest", "host", "arbiter")}
    cluster = {
        "broker": {"host": "127.0.0.1", "port": 0},
        "job": {"id": "clustertest", "config": "job.json"},
        "parties": {
            "guest": [{"data": str(tmp_path / "c0.npz"),
                       "out": outs["guest"]}],
            "host": [{"data": str(tmp_path / "c1.npz"),
                      "out": outs["host"]}],
            "arbiter": [{"out": outs["arbiter"]}],
        },
        "cpu": True,
    }
    rcs = run_local(cluster, conf_dir=str(tmp_path), timeout=700)
    assert rcs == {"guest_0": 0, "host_0": 0, "arbiter_0": 0}
    with open(outs["arbiter"], "rb") as f:
        arb = pickle.load(f)
    assert len(arb["loss_history"]) == 1
    with open(outs["guest"], "rb") as f:
        guest = pickle.load(f)
    assert guest["history"][0]["loss"] > 0
    assert "encryption" in guest["phases"]


def test_mesh_conf_plan():
    """A mesh conf expands into one mesh-party command per host, no
    broker (the SPMD federation mode, deploy/mesh_conf.yml)."""
    from flashe_tpu.runtime.cluster import plan_commands

    conf = {
        "mesh": {
            "coordinator": "10.0.0.2:9401",
            "hosts": [{"host": "10.0.0.2", "data": "/d/s0.npz"},
                      "10.0.0.3"],
            "rounds": 7,
            "model": "mlp",
        },
    }
    plan = plan_commands(conf)
    assert set(plan) == {"mesh_0", "mesh_1"}
    assert "broker" not in plan
    c0 = plan["mesh_0"]["cmd"]
    assert "--coordinator 10.0.0.2:9401" in c0
    assert "--num-processes 2" in c0
    assert "--process-id 0" in c0
    assert "--rounds 7" in c0
    assert "--data /d/s0.npz" in c0
    assert "--data" not in plan["mesh_1"]["cmd"]
    assert plan["mesh_1"]["host"] == "10.0.0.3"
