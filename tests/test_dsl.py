"""DSL job layer: parsing, nn_define interpretation, evaluation metrics,
and end-to-end DSL jobs (in-process and one-process-per-party).

Reference surface: fate_flow's dsl_parser + task scheduler walk
(fate_flow/driver/dsl_parser.py, task_scheduler.py:133-315), the Keras
nn_define builder (jzf_nn_model.py:99-109) and the Evaluation module.
"""

import json

import numpy as np
import pytest

from flashe_tpu.nn.evaluation import (
    binary_auc, binary_ks, evaluate_classification,
)
from flashe_tpu.runtime.dsl import (
    JobConf, parse_dsl, run_dsl_job, translate_homo_nn,
)

# ---------------------------------------------------------------- fixtures

DSL = {"components": {
    "dataio_0": {"module": "DataIO",
                 "input": {"data": {"data": ["args.train_data"]}},
                 "output": {"data": ["train"]}},
    "homo_nn_0": {"module": "JZFHomoNN",
                  "input": {"data": {"train_data": ["dataio_0.train"]}},
                  "output": {"data": ["train"], "model": ["homo_nn"]}},
    "evaluation_0": {"module": "Evaluation",
                     "input": {"data": {"data": ["homo_nn_0.train"]}},
                     "output": {"data": ["evaluate"]}},
}}


def mlp_define(in_dim=8, hidden=16, classes=3):
    """A small hand-written Keras-style Sequential nn_define."""
    return {"class_name": "Sequential", "config": {"name": "mlp", "layers": [
        {"class_name": "Dense",
         "config": {"name": "d1", "units": hidden, "activation": "relu"}},
        {"class_name": "Dense",
         "config": {"name": "d2", "units": classes,
                    "activation": "softmax"}},
    ]}}


def make_conf(store_tables, algorithm_params):
    n_hosts = len(store_tables) - 1
    return {
        "initiator": {"role": "guest", "party_id": 9999},
        "role": {"guest": [9999],
                 "host": [10000 + i for i in range(n_hosts)],
                 "arbiter": [99999]},
        "role_parameters": {
            "guest": {"args": {"data": {"train_data": [store_tables[0]]}},
                      "dataio_0": {"with_label": [True],
                                   "label_type": ["int"]}},
            "host": {"args": {"data": {"train_data": store_tables[1:]}},
                     "dataio_0": {"with_label": [True] * n_hosts}},
        },
        "algorithm_parameters": {"homo_nn_0": algorithm_params},
    }


def seed_store(tmp_path, n_parties=3, n=48, dim=8, classes=3, seq=False):
    from flashe_tpu.data.store import DataStore

    store = DataStore(str(tmp_path / "tables"))
    rng = np.random.RandomState(7)
    tables = []
    for i in range(n_parties):
        if seq:
            x = rng.randint(0, classes, (n, dim)).astype(np.float32)
            y = None
        else:
            x = rng.randn(n, dim).astype(np.float32)
            y = rng.randint(0, classes, n).astype(np.int64)
        store.put("t", f"p{i}", x, y)
        tables.append({"namespace": "t", "name": f"p{i}"})
    return store, tables


FLASHE_ARGS = {
    "quantize": {"int_bits": 20, "batch": False, "element_bits": 16,
                 "padding": True, "secure": True},
    "precompute": {"enable": False}, "mode": "parallel",
    "num_partitions": 1,
}

# ----------------------------------------------------------------- parsing


def test_parse_dsl_topological_order():
    comps = parse_dsl(DSL)
    names = [c.name for c in comps]
    assert names.index("dataio_0") < names.index("homo_nn_0")
    assert names.index("homo_nn_0") < names.index("evaluation_0")


def test_parse_dsl_rejects_cycle_and_unknown():
    cyc = {"components": {
        "a": {"module": "DataIO", "input": {"data": {"data": ["b.out"]}},
              "output": {"data": ["out"]}},
        "b": {"module": "DataIO", "input": {"data": {"data": ["a.out"]}},
              "output": {"data": ["out"]}},
    }}
    with pytest.raises(ValueError, match="cycle"):
        parse_dsl(cyc)
    bad = {"components": {
        "a": {"module": "DataIO",
              "input": {"data": {"data": ["nosuch.out"]}},
              "output": {"data": ["out"]}}}}
    with pytest.raises(ValueError, match="unknown upstream"):
        parse_dsl(bad)


def test_conf_per_party_indexing():
    conf = JobConf.parse(make_conf(
        [{"namespace": "t", "name": "g"},
         {"namespace": "t", "name": "h0"},
         {"namespace": "t", "name": "h1"}],
        {"model": "mlp"}))
    assert conf.n_hosts == 2
    assert conf.args_data("host", 1, "train_data")["name"] == "h1"
    assert conf.component_param("dataio_0", "guest", 0)["with_label"] is True


def test_translate_reference_style_params():
    ap = {
        "config_type": "keras",
        "nn_define": mlp_define(),
        "batch_size": 128,
        "optimizer": {"optimizer": "Adam", "learning_rate": 0.0005},
        "early_stop": {"early_stop": "diff", "eps": 0.0001},
        "loss": "categorical_crossentropy",
        "metrics": ["accuracy"],
        "max_iter": 2,
        "secure_aggregate": "flashe",
        "secure_aggregate_args": FLASHE_ARGS,
    }
    param, create_label = translate_homo_nn(ap)
    assert param.model == "nn_define"
    assert param.optimizer == "adam"
    assert param.learning_rate == pytest.approx(5e-4)
    assert param.secure_aggregate_args.quantize.int_bits == 20
    assert not create_label

    ap_lstm = dict(ap, nn_define={
        "class_name": "Sequential",
        "config": {"name": "lstm", "layers": [
            {"class_name": "Embedding",
             "config": {"name": "e", "input_dim": 5, "output_dim": 4}},
            {"class_name": "GRU",
             "config": {"name": "g", "units": 8,
                        "return_sequences": True}},
            {"class_name": "Dense",
             "config": {"name": "d", "units": 5, "activation": "linear"}},
        ]}})
    _, create_label = translate_homo_nn(ap_lstm)
    assert create_label  # config.name == "lstm" (enter_point.py:160-166)

# ------------------------------------------------------------- nn_define


def test_keras_define_param_count_and_shapes():
    import jax
    import jax.numpy as jnp

    from flashe_tpu.nn.keras_define import (
        count_params_define, from_nn_define,
    )

    m = from_nn_define(mlp_define(8, 16, 3))
    x = jnp.zeros((2, 8), jnp.float32)
    n = count_params_define(m, x)
    assert n == (8 * 16 + 16) + (16 * 3 + 3)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 3)


def test_keras_define_functional_graph_add():
    """Functional Model graphs with Add merges (the ResNet shape)."""
    import jax
    import jax.numpy as jnp

    from flashe_tpu.nn.keras_define import from_nn_define

    define = {"class_name": "Sequential", "config": {
        "name": "g", "layers": [
            {"class_name": "Reshape",
             "config": {"name": "r", "target_shape": [4, 4, 2]}},
            {"class_name": "Model", "config": {"name": "m", "layers": [
                {"class_name": "InputLayer",
                 "config": {"name": "in"}, "name": "in",
                 "inbound_nodes": []},
                {"class_name": "Conv2D",
                 "config": {"name": "c1", "filters": 2,
                            "kernel_size": [3, 3], "padding": "same",
                            "use_bias": False},
                 "name": "c1", "inbound_nodes": [[["in", 0, 0, {}]]]},
                {"class_name": "BatchNormalization",
                 "config": {"name": "bn"}, "name": "bn",
                 "inbound_nodes": [[["c1", 0, 0, {}]]]},
                {"class_name": "Add", "config": {"name": "add"},
                 "name": "add",
                 "inbound_nodes": [[["in", 0, 0, {}], ["bn", 0, 0, {}]]]},
                {"class_name": "Activation",
                 "config": {"name": "act", "activation": "relu"},
                 "name": "act", "inbound_nodes": [[["add", 0, 0, {}]]]},
                {"class_name": "Flatten", "config": {"name": "f"},
                 "name": "f", "inbound_nodes": [[["act", 0, 0, {}]]]},
                {"class_name": "Dense",
                 "config": {"name": "d", "units": 3},
                 "name": "d", "inbound_nodes": [[["f", 0, 0, {}]]]},
            ]}},
        ]}}
    m = from_nn_define(define)
    x = jnp.zeros((2, 32), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 3)


def test_keras_define_gru_sequence():
    import jax
    import jax.numpy as jnp

    from flashe_tpu.nn.keras_define import from_nn_define

    define = {"class_name": "Sequential", "config": {
        "name": "lstm", "layers": [
            {"class_name": "Embedding",
             "config": {"name": "e", "input_dim": 5, "output_dim": 4,
                        "batch_input_shape": [None, 7]}},
            {"class_name": "GRU",
             "config": {"name": "g", "units": 8, "activation": "tanh",
                        "return_sequences": True}},
            {"class_name": "Dense",
             "config": {"name": "d", "units": 5, "activation": "linear"}},
        ]}}
    m = from_nn_define(define)
    x = jnp.zeros((2, 7), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 7, 5)

# ------------------------------------------------------------- evaluation


def test_binary_auc_matches_known_case():
    y = np.array([0, 0, 1, 1])
    s = np.array([0.1, 0.4, 0.35, 0.8])
    assert binary_auc(y, s) == pytest.approx(0.75)
    assert binary_ks(y, s) == pytest.approx(0.5)
    perfect = binary_auc(np.array([0, 1]), np.array([0.1, 0.9]))
    assert perfect == pytest.approx(1.0)


def test_evaluate_classification_multiclass():
    y = np.array([0, 1, 2, 2])
    scores = np.eye(3)[[0, 1, 2, 1]]
    m = evaluate_classification(y, scores)
    assert m["accuracy"] == pytest.approx(0.75)
    assert 0.0 <= m["macro_f1"] <= 1.0

# ------------------------------------------------------------- end-to-end


@pytest.mark.slow
def test_run_dsl_job_inprocess(tmp_path):
    store, tables = seed_store(tmp_path)
    conf = make_conf(tables, {
        "model": "mlp", "model_kwargs": {"features": [16, 3]},
        "batch_size": 16, "max_iter": 2,
        "optimizer": {"optimizer": "Adam", "learning_rate": 0.01},
        "secure_aggregate": "flashe",
        "secure_aggregate_args": FLASHE_ARGS,
    })
    res = run_dsl_job(DSL, conf, store=store)
    assert len(res["arbiter"]["homo_nn_0"]["loss_history"]) == 2
    for role in ("guest", "host0", "host1"):
        ev = res[role]["evaluation_0"]
        assert 0.0 <= ev["accuracy"] <= 1.0


def test_run_dsl_job_nn_define(tmp_path):
    """A reference-style conf (nn_define JSON, no registry name)."""
    store, tables = seed_store(tmp_path, n_parties=2)
    conf = make_conf(tables, {
        "config_type": "keras",
        "nn_define": mlp_define(8, 12, 3),
        "batch_size": 16, "max_iter": 1,
        "optimizer": {"optimizer": "Adam", "learning_rate": 0.01},
        "secure_aggregate": "plain",
        "secure_aggregate_args": {"quantize": {
            "int_bits": 20, "element_bits": 16, "padding": True,
            "secure": True}},
    })
    res = run_dsl_job(DSL, conf, store=store)
    assert len(res["arbiter"]["homo_nn_0"]["loss_history"]) == 1
    assert "accuracy" in res["guest"]["evaluation_0"]


def test_run_dsl_job_lstm_create_label(tmp_path):
    """nn_define config.name == 'lstm' triggers next-token targets."""
    store, tables = seed_store(tmp_path, n_parties=2, dim=7, classes=5,
                               seq=True)
    conf = make_conf(tables, {
        "nn_define": {"class_name": "Sequential", "config": {
            "name": "lstm", "layers": [
                {"class_name": "Embedding",
                 "config": {"name": "e", "input_dim": 5, "output_dim": 4}},
                {"class_name": "GRU",
                 "config": {"name": "g", "units": 8,
                            "return_sequences": True}},
                {"class_name": "Dense",
                 "config": {"name": "d", "units": 5,
                            "activation": "linear"}},
            ]}},
        "batch_size": 16, "max_iter": 1,
        "optimizer": {"optimizer": "Adam", "learning_rate": 0.01},
        "secure_aggregate": "plain",
    })
    # with_label=False: sequences carry their own targets
    conf["role_parameters"]["guest"]["dataio_0"] = {"with_label": [False]}
    conf["role_parameters"]["host"]["dataio_0"] = {"with_label": [False]}
    res = run_dsl_job(DSL, conf, store=store)
    assert len(res["arbiter"]["homo_nn_0"]["loss_history"]) == 1
    assert 0.0 <= res["guest"]["evaluation_0"]["accuracy"] <= 1.0


def test_train_publish_then_predict_job(tmp_path, monkeypatch):
    """job_parameters.publish registers the guest model; a follow-up
    job_type=predict DSL job loads and scores with it
    (reference predict flow, enter_point.py:218-260)."""
    monkeypatch.setenv("FLASHE_MODELS_DIR", str(tmp_path / "models"))
    store, tables = seed_store(tmp_path, n_parties=2)
    conf = make_conf(tables, {
        "model": "mlp", "model_kwargs": {"features": [8, 3]},
        "batch_size": 16, "max_iter": 1,
        "optimizer": {"optimizer": "Adam", "learning_rate": 0.01},
        "secure_aggregate": "plain",
    })
    conf["job_parameters"] = {"job_type": "train", "publish": "dslmodel",
                              "model_version": "job42"}
    res = run_dsl_job(DSL, conf, store=store)
    pub = res["guest"]["homo_nn_0"]["published"]
    assert pub["namespace"] == "dslmodel" and pub["version"] == "job42"

    conf_pred = make_conf(tables, conf["algorithm_parameters"]["homo_nn_0"])
    conf_pred["job_parameters"] = {"job_type": "predict",
                                   "model": {"namespace": "dslmodel"}}
    res2 = run_dsl_job(DSL, conf_pred, store=store)
    assert res2["guest"]["homo_nn_0"]["model"]["version"] == "job42"
    assert "loss_history" not in res2["arbiter"].get("homo_nn_0", {})
    assert 0.0 <= res2["guest"]["evaluation_0"]["accuracy"] <= 1.0
    assert 0.0 <= res2["host0"]["evaluation_0"]["accuracy"] <= 1.0


@pytest.mark.slow
def test_submit_dsl_job_processes(tmp_path):
    """One OS process per party over the native broker (fate_flow shape)."""
    from flashe_tpu.runtime.job import submit_dsl_job
    from flashe_tpu.runtime.job_manager import JobRegistry

    store, tables = seed_store(tmp_path, n_parties=2)
    conf = make_conf(tables, {
        "model": "mlp", "model_kwargs": {"features": [8, 3]},
        "batch_size": 16, "max_iter": 1,
        "optimizer": {"optimizer": "Adam", "learning_rate": 0.01},
        "secure_aggregate": "plain",
    })
    reg = JobRegistry(str(tmp_path / "jobs"))
    res = submit_dsl_job(
        DSL, conf, registry=reg, data_root=str(tmp_path / "tables"),
        env_overrides={"FLASHE_FORCE_CPU": "1"}, timeout=600)
    assert len(res["arbiter_0"]["homo_nn_0"]["loss_history"]) == 1
    assert "accuracy" in res["guest_0"]["evaluation_0"]
    job_id = res["__job__"]["job_id"]
    assert reg.query(job_id)["status"] == "success"
