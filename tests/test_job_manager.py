"""Job registry (query/stop/logs) + dataset store (upload/download):
the fate_flow_client surface (fate_flow/fate_flow_client.py:196-225,
driver/task_scheduler.py:430 kill_job, utils/upload.py / download.py)."""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from flashe_tpu.__main__ import main as cli_main
from flashe_tpu.data.store import DataStore
from flashe_tpu.runtime.job_manager import JobRegistry


# -- dataset store -----------------------------------------------------------


def _write_csv(path, n=20, d=5, seed=3):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    y = rng.randint(0, 3, n)
    with open(path, "w") as f:
        f.write("y," + ",".join(f"x{i}" for i in range(d)) + "\n")
        for i in range(n):
            f.write(f"{y[i]}," + ",".join(repr(v) for v in x[i].tolist())
                    + "\n")
    return x, y


def test_store_upload_download_roundtrip(tmp_path):
    csv_in = str(tmp_path / "in.csv")
    x, y = _write_csv(csv_in)
    store = DataStore(str(tmp_path / "store"))

    meta = store.upload_csv(csv_in, "experiment", "train")
    assert meta["count"] == 20 and meta["labeled"]

    lx, ly, _ = store.load("experiment", "train")
    np.testing.assert_allclose(lx, x, rtol=1e-6)
    np.testing.assert_array_equal(ly, y)

    csv_out = str(tmp_path / "out.csv")
    store.download_csv("experiment", "train", csv_out)
    store.upload_csv(csv_out, "experiment", "roundtrip")
    lx2, ly2, _ = store.load("experiment", "roundtrip")
    np.testing.assert_allclose(lx2, x, rtol=1e-6)
    np.testing.assert_array_equal(ly2, y)

    names = {(m["namespace"], m["name"]) for m in store.list_tables()}
    assert ("experiment", "train") in names
    assert store.delete("experiment", "roundtrip")
    assert not store.delete("experiment", "roundtrip")


def test_store_dtable_and_unlabeled(tmp_path):
    from flashe_tpu.data.table import Session

    store = DataStore(str(tmp_path / "store"))
    x = np.arange(12, dtype=np.float32).reshape(4, 3)
    store.put("ns", "plain", x, None)
    lx, ly, meta = store.load("ns", "plain")
    assert ly is None and meta["feature_shape"] == [3]

    sess = Session("job")
    table = store.to_dtable(sess, "ns", "plain")
    assert table.count() == 4
    inst = table.get(2)
    np.testing.assert_allclose(inst.features, x[2])
    assert inst.label is None


def test_store_cli(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("FLASHE_DATA_DIR", str(tmp_path / "store"))
    csv_in = str(tmp_path / "in.csv")
    _write_csv(csv_in)

    assert cli_main(["upload", "-f", csv_in, "-n", "ns", "-t", "tb"]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["count"] == 20

    assert cli_main(["tables", "--json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and rows[0]["name"] == "tb"

    out_csv = str(tmp_path / "out.csv")
    assert cli_main(["download", "-n", "ns", "-t", "tb", "-o", out_csv]) == 0
    assert os.path.exists(out_csv)


@pytest.mark.slow
def test_failed_task_aborts_job_and_marks_registry(tmp_path, monkeypatch):
    """A dead task aborts the job and the registry records the failure
    (reference job_detector / TaskScheduler.check_task_status,
    task_scheduler.py:247-286)."""
    monkeypatch.setenv("FLASHE_JOBS_DIR", str(tmp_path / "jobs"))
    from flashe_tpu.data import federated_dataset
    from flashe_tpu.runtime.config import (
        HomoNNParam, QuantizeConfig, SecureAggregateArgs,
    )
    from flashe_tpu.runtime.job import submit_job

    shards = federated_dataset("mlp", 2, 32, seed=0)
    param = HomoNNParam(
        model="mlp", model_kwargs={"features": (8, 10)},
        secure_aggregate="flashe",
        secure_aggregate_args=SecureAggregateArgs(
            quantize=QuantizeConfig(int_bits=20, element_bits=16)),
        max_iter=1, batch_size=16,
    )
    workdir = str(tmp_path / "work")
    os.makedirs(workdir)
    # corrupt the host's data shard after the runner writes it: the host
    # executor dies on load and the runner must abort the whole job
    orig_savez = np.savez

    def sabotage(path, **arrays):
        orig_savez(path, **arrays)
        if "host_0" in str(path):
            with open(path, "wb") as f:
                f.write(b"not-an-npz")

    monkeypatch.setattr(np, "savez", sabotage)
    with pytest.raises(RuntimeError, match="host_0 failed"):
        submit_job(param, shards, workdir=workdir, timeout=300,
                   env_overrides={"JAX_PLATFORMS": "cpu",
                                  "FLASHE_FORCE_CPU": "1"})

    from flashe_tpu.runtime.job_manager import default_registry

    jobs = default_registry().list_jobs()
    assert len(jobs) == 1
    rec = jobs[0]
    assert rec["status"] == "failed"
    assert rec["tasks"]["host_0"]["status"] == "failed"
    # the failing task's log was captured
    logs = default_registry().read_log(rec["job_id"], task="host_0")
    assert "host_0" in logs


# -- job registry --------------------------------------------------------------


def test_registry_lifecycle(tmp_path):
    reg = JobRegistry(str(tmp_path / "jobs"))
    reg.create("j1", {"n_hosts": 1})
    reg.set_task("j1", "guest_0", pid=999999, status="running")
    with open(os.path.join(reg.log_dir("j1"), "guest_0.log"), "w") as f:
        f.write("line1\nline2\nline3\n")

    rec = reg.query("j1")
    assert rec["status"] == "running"
    assert rec["tasks"]["guest_0"]["pid"] == 999999
    assert [r["job_id"] for r in reg.list_jobs()] == ["j1"]

    logs = reg.read_log("j1", task="guest_0", tail=2)
    assert logs["guest_0"] == "line2\nline3"

    reg.finish("j1", "success")
    assert reg.query("j1")["status"] == "success"
    assert reg.query("j1")["tasks"]["guest_0"]["status"] == "success"
    # stopping a finished job is a no-op
    assert reg.stop("j1")["status"] == "success"

    with pytest.raises(KeyError):
        reg.query("nope")


def test_registry_stop_kills_exact_pid(tmp_path):
    reg = JobRegistry(str(tmp_path / "jobs"))
    proc = subprocess.Popen([sys.executable, "-c",
                             "import time; time.sleep(300)"])
    try:
        reg.create("j2", {})
        reg.set_task("j2", "host_0", pid=proc.pid)
        rec = reg.stop("j2")
        assert rec["status"] == "canceled"
        assert rec["tasks"]["host_0"]["status"] == "canceled"
        assert reg.is_canceled("j2")
        deadline = time.time() + 10
        while proc.poll() is None and time.time() < deadline:
            time.sleep(0.05)
        assert proc.poll() is not None
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_submit_from_uploaded_table(tmp_path, monkeypatch, capsys):
    """Train on an uploaded table (the upload -> DataIO -> train DSL flow:
    every reference job starts from a stored table, SURVEY.md section 2.2)."""
    monkeypatch.setenv("FLASHE_DATA_DIR", str(tmp_path / "store"))
    rng = np.random.RandomState(0)
    n, d = 96, 16
    y = rng.randint(0, 4, n)
    x = rng.randn(n, d).astype(np.float32)
    x[np.arange(n), y] += 2.0
    DataStore().put("exp", "train", x, y.astype(np.int32))

    cfg = {
        "param": {
            "model": "mlp",
            "model_kwargs": {"features": [8, 4]},
            "secure_aggregate": "flashe",
            "secure_aggregate_args": {
                "quantize": {"int_bits": 20, "batch": False,
                             "element_bits": 16, "padding": True,
                             "secure": True},
                "mode": "parallel", "num_partitions": 1,
            },
            "max_iter": 1, "batch_size": 32, "learning_rate": 0.01,
        },
        "dataset": {"namespace": "exp", "name": "train"},
        "n_clients": 3,
    }
    cfg_path = str(tmp_path / "job.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    assert cli_main(["submit", "-c", cfg_path, "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["loss_per_round"]) == 1
    assert out["loss_per_round"][0] > 0
    assert "encryption" in out["phases"]


def test_registry_cli(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("FLASHE_JOBS_DIR", str(tmp_path / "jobs"))
    reg = JobRegistry()
    reg.create("j3", {})
    with open(os.path.join(reg.log_dir("j3"), "arbiter_0.log"), "w") as f:
        f.write("hello\n")

    assert cli_main(["jobs", "--json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["job_id"] == "j3"

    assert cli_main(["query", "-j", "j3"]) == 0
    assert json.loads(capsys.readouterr().out)["status"] == "running"

    assert cli_main(["stop", "-j", "j3"]) == 0
    assert json.loads(capsys.readouterr().out)["status"] == "canceled"

    assert cli_main(["logs", "-j", "j3", "--task", "arbiter_0"]) == 0
    assert "hello" in capsys.readouterr().out
