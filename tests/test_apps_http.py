"""Tracking / pipeline / permission / schedule HTTP apps
(fate_flow/apps/{tracking,pipeline,permission,schedule}_app.py analogues:
runtime/apps.py + runtime/permission.py + the JobServer job queue)."""

import json
import os
import threading
import time

import pytest

from flashe_tpu.runtime.client import FlasheClient, ServerError
from flashe_tpu.runtime.job_manager import JobRegistry
from flashe_tpu.runtime.server import JobServer

DSL = {"components": {
    "dataio_0": {"module": "DataIO",
                 "input": {"data": {"data": ["args.train_data"]}},
                 "output": {"data": ["train"]}},
    "homo_nn_0": {"module": "JZFHomoNN",
                  "input": {"data": {"train_data": ["dataio_0.train"]}},
                  "output": {"data": ["train"]}},
    "evaluation_0": {"module": "Evaluation",
                     "input": {"data": {"data": ["homo_nn_0.train"]}},
                     "output": {"data": ["evaluate"]}},
}}

CONF = {
    "initiator": {"role": "guest", "party_id": 9999},
    "role": {"guest": [9999], "host": [10000], "arbiter": [99999]},
    "role_parameters": {
        "guest": {"args": {"data": {"train_data": [
            {"namespace": "ns", "name": "g"}]}}},
        "host": {"args": {"data": {"train_data": [
            {"namespace": "ns", "name": "h"}]}},
            "homo_nn_0": {"batch_size": [8]}},
    },
    "algorithm_parameters": {"homo_nn_0": {
        "model": "mlp", "batch_size": 16, "max_iter": 2,
        "secure_aggregate": "flashe"}},
}

RESULT = {
    "arbiter_0": {"homo_nn_0": {"loss_history": [2.0, 1.5, 1.0]},
                  "phases": {"encryption": {"total_s": 1.0, "count": 3}}},
    "guest_0": {"homo_nn_0": {"history": [
        {"loss": 2.1, "accuracy": 0.5}, {"loss": 1.4, "accuracy": 0.8}]},
        "evaluation_0": {"accuracy": 0.9, "auc": 0.95}},
}


@pytest.fixture()
def server(tmp_path):
    reg = JobRegistry(str(tmp_path / "jobs"))
    srv = JobServer("127.0.0.1", 0, registry=reg, force_cpu=True).start()
    host, port = srv.address
    yield FlasheClient(f"http://{host}:{port}"), srv, reg
    srv.close()


def _seed_job(reg, job_id="tjob"):
    reg.create(job_id, {"dsl": DSL, "conf": CONF, "n_hosts": 1})
    reg.set_task(job_id, "guest_0", pid=1, status="success")
    with open(os.path.join(reg.root, job_id, "result.json"), "w") as f:
        json.dump(RESULT, f)
    reg.finish(job_id, "success")
    return job_id


# ------------------------------------------------------------- tracking


def test_tracking_job_data_view(server):
    client, _, reg = server
    jid = _seed_job(reg)
    view = client._call("POST", "/v1/tracking/job/data_view",
                        {"job_id": jid})
    assert view["status"] == "success"
    assert view["tasks"] == {"guest_0": "success"}
    assert view["roles"]["host"] == [10000]
    assert view["dataset"]["guest"]["train_data"][0]["name"] == "g"


def test_tracking_metric_endpoints(server):
    client, _, reg = server
    jid = _seed_job(reg)
    allm = client._call("POST", "/v1/tracking/component/metric/all",
                        {"job_id": jid})
    assert allm["arbiter_0"]["homo_nn_0"]["loss"] == [
        [0, 2.0], [1, 1.5], [2, 1.0]]
    assert allm["guest_0"]["homo_nn_0"]["accuracy"][1] == [1, 0.8]
    assert allm["guest_0"]["evaluation_0"]["auc"] == [[0, 0.95]]

    names = client._call("POST", "/v1/tracking/component/metrics",
                         {"job_id": jid})
    assert names["guest_0"]["homo_nn_0"] == ["accuracy", "loss"]

    data = client._call("POST", "/v1/tracking/component/metric_data",
                        {"job_id": jid, "component_name": "homo_nn_0",
                         "role": "arbiter", "metric_name": "loss"})
    assert list(data) == ["arbiter_0"]
    assert data["arbiter_0"]["loss"][-1] == [2, 1.0]

    # unknown job -> 404 through the HTTP boundary
    with pytest.raises(ServerError, match="404"):
        client._call("POST", "/v1/tracking/component/metric/all",
                     {"job_id": "nope"})


def test_tracking_component_parameters(server):
    client, _, reg = server
    jid = _seed_job(reg)
    out = client._call("POST", "/v1/tracking/component/parameters",
                       {"job_id": jid, "component_name": "homo_nn_0",
                        "role": "host", "ordinal": 0})
    # algorithm params overlaid with the host's role params
    assert out["parameters"]["batch_size"] == 8
    assert out["parameters"]["secure_aggregate"] == "flashe"
    out = client._call("POST", "/v1/tracking/component/parameters",
                       {"job_id": jid, "component_name": "homo_nn_0",
                        "role": "guest"})
    assert out["parameters"]["batch_size"] == 16


# ------------------------------------------------------------- pipeline


def test_pipeline_dag_dependency(server):
    client, _, reg = server
    jid = _seed_job(reg)
    dag = client._call("POST", "/v1/pipeline/dag/dependency",
                       {"job_id": jid})
    assert dag["component_list"] == ["dataio_0", "homo_nn_0",
                                     "evaluation_0"]
    assert dag["dependencies"] == {"dataio_0": [],
                                   "homo_nn_0": ["dataio_0"],
                                   "evaluation_0": ["homo_nn_0"]}
    assert dag["component_module"]["homo_nn_0"] == "JZFHomoNN"

    # the web board renders the same DAG view
    import urllib.request

    _, srv, _ = server
    base = f"http://{srv.address[0]}:{srv.address[1]}"
    page = urllib.request.urlopen(f"{base}/board/{jid}",
                                  timeout=10).read().decode()
    assert "pipeline DAG" in page and "JZFHomoNN" in page
    assert "tracked metrics" in page


# ----------------------------------------------------------- permission


def test_permission_grant_revoke_query(server, tmp_path, monkeypatch):
    monkeypatch.setenv("FLASHE_PERMISSIONS_PATH",
                       str(tmp_path / "perm.json"))
    from flashe_tpu.runtime.permission import effective_authorization

    client, _, _ = server
    # defaults are granted out of the box
    q = client._call("POST", "/v1/permission/query/privilege",
                     {"src_role": "guest"})
    assert {"variable": "guest_loss", "src_role": "guest",
            "dst_role": "arbiter"} in q["privileges"]
    effective_authorization().check("guest_loss", "guest", "arbiter")

    # revoke a default channel -> enforcement rejects it
    client._call("POST", "/v1/permission/delete/privilege",
                 {"variable": "guest_loss", "src_role": "guest",
                  "dst_role": "arbiter"})
    with pytest.raises(PermissionError):
        effective_authorization().check("guest_loss", "guest", "arbiter")
    q = client._call("POST", "/v1/permission/query/privilege",
                     {"src_role": "guest"})
    assert {"variable": "guest_loss", "src_role": "guest",
            "dst_role": "arbiter"} not in q["privileges"]

    # grant a custom channel; other channels unaffected
    client._call("POST", "/v1/permission/grant/privilege",
                 {"variable": "side_channel", "src_role": "host",
                  "dst_role": "guest"})
    auth = effective_authorization()
    auth.check("side_channel", "host", "guest")
    auth.check("host_loss", "host", "arbiter")
    with pytest.raises(PermissionError):
        auth.check("side_channel", "guest", "host")  # directed, not mutual

    # re-grant the revoked default -> back to the static matrix
    client._call("POST", "/v1/permission/grant/privilege",
                 {"variable": "guest_loss", "src_role": "guest",
                  "dst_role": "arbiter"})
    effective_authorization().check("guest_loss", "guest", "arbiter")


def test_permission_enforced_in_simulation(tmp_path, monkeypatch):
    """A revoked channel is rejected by the federation runtime itself."""
    monkeypatch.setenv("FLASHE_PERMISSIONS_PATH",
                       str(tmp_path / "perm.json"))
    from flashe_tpu.runtime.permission import default_privilege_store
    from flashe_tpu.runtime.simulate import run_roles

    default_privilege_store().revoke("guest_loss", "guest", "arbiter")

    def guest(trv):
        trv.guest_loss.remote(1.25, role="arbiter", idx=0, suffix=(0,))

    def arbiter(trv):
        return trv.guest_loss.get(idx=0, suffix=(0,))

    with pytest.raises(Exception, match="guest_loss"):
        run_roles(0, guest, None, arbiter)


# ------------------------------------------------------------- schedule


def test_job_queue_bounded_concurrency(tmp_path, monkeypatch):
    """Submissions beyond max_concurrent wait in FIFO order; stopping a
    waiting job dequeues it without running (DAGScheduler +
    MAX_CONCURRENT_JOB_RUN semantics, fate_flow_server.py:101)."""
    release = threading.Event()
    started = []

    def fake_run(self, job_id, body):
        started.append(job_id)
        rec = self.registry.query(job_id)
        rec["status"] = "running"
        self.registry._write(job_id, rec)
        release.wait(timeout=30)
        self.registry.finish(job_id, "success")

    monkeypatch.setattr(JobServer, "_run_job", fake_run)
    reg = JobRegistry(str(tmp_path / "jobs"))
    srv = JobServer("127.0.0.1", 0, registry=reg, max_concurrent=1).start()
    try:
        client = FlasheClient(f"http://{srv.address[0]}:{srv.address[1]}")
        jids = [client.submit_job(DSL, CONF)["job_id"] for _ in range(3)]
        deadline = time.time() + 10
        while not started and time.time() < deadline:
            time.sleep(0.02)
        assert started == [jids[0]]
        qv = client._call("GET", "/v1/schedule/queue")
        assert qv["max_concurrent"] == 1
        assert qv["running"] == [jids[0]]
        assert qv["waiting"] == jids[1:]
        assert client.query_job(jids[1])["status"] == "waiting"

        # stop the middle job while it waits: it must never start
        client.stop_job(jids[1])
        release.set()
        deadline = time.time() + 15
        while time.time() < deadline:
            sts = {j: client.query_job(j)["status"] for j in jids}
            if (sts[jids[0]] == "success" and sts[jids[2]] == "success"):
                break
            time.sleep(0.05)
        assert client.query_job(jids[0])["status"] == "success"
        assert client.query_job(jids[1])["status"] == "canceled"
        assert client.query_job(jids[2])["status"] == "success"
        assert jids[1] not in started
    finally:
        srv.close()


# ------------------------------------------------- data / table / log


def test_table_info_delete_download(server):
    """Reference table_app (info/delete) + data_access download."""
    client, _, _ = server
    csv_text = "y,f0,f1\n0,1.0,2.0\n1,3.0,4.0\n"
    client.upload("appns", "t1", csv_text)
    info = client.table_info("appns", "t1")
    assert info["count"] == 2 and info["namespace"] == "appns"

    got = client.download("appns", "t1")
    lines = got.strip().splitlines()
    assert lines[0].split(",")[0] == "y" and len(lines) == 3

    assert client.delete_table("appns", "t1")["deleted"]
    with pytest.raises(ServerError, match="404"):
        client.table_info("appns", "t1")


def test_job_log_and_config_endpoints(server):
    client, _, reg = server
    jid = _seed_job(reg)
    os.makedirs(reg.log_dir(jid), exist_ok=True)
    with open(os.path.join(reg.log_dir(jid), "guest_0.log"), "w") as f:
        f.write("line1\nline2\nline3\n")
    logs = client.job_log(jid, task="guest_0", tail=2)
    assert logs["guest_0"] == "line2\nline3"
    cfg = client.job_config(jid)
    assert cfg["dsl"] == DSL and cfg["conf"]["role"]["host"] == [10000]
