"""Federated k-fold cross-validation (the reference ModelBase's CV
dispatch arm, federatedml/model_base.py:74-103)."""

import numpy as np
import pytest

from flashe_tpu.data.store import DataStore
from flashe_tpu.nn.cross_validation import kfold_indices
from flashe_tpu.runtime.dsl import run_dsl_job


def test_kfold_indices_partition():
    folds = kfold_indices(10, 3, shuffle=True, seed=1)
    assert len(folds) == 3
    all_test = np.concatenate([te for _, te in folds])
    assert sorted(all_test.tolist()) == list(range(10))
    for tr, te in folds:
        assert set(tr) & set(te) == set()
        assert len(tr) + len(te) == 10


def test_kfold_rejects_too_few_samples():
    with pytest.raises(ValueError):
        kfold_indices(2, 3)


DSL = {"components": {
    "dataio_0": {"module": "DataIO",
                 "input": {"data": {"data": ["args.train_data"]}},
                 "output": {"data": ["train"]}},
    "homo_nn_0": {"module": "HomoNN",
                  "input": {"data": {"train_data": ["dataio_0.train"]}},
                  "output": {"data": ["train"], "model": ["homo_nn"]}},
}}


def test_dsl_cross_validation_job(tmp_path):
    store = DataStore(str(tmp_path / "tables"))
    rng = np.random.RandomState(0)
    tables = []
    for i in range(2):
        x = rng.rand(24, 8).astype(np.float32)
        y = rng.randint(0, 3, 24)
        store.put("t", f"p{i}", x, y)
        tables.append({"namespace": "t", "name": f"p{i}"})

    conf = {
        "initiator": {"role": "guest", "party_id": 9999},
        "job_parameters": {"work_mode": 0},
        "role": {"guest": [9999], "host": [10000], "arbiter": [9998]},
        "role_parameters": {
            "guest": {"args": {"data": {"train_data": [tables[0]]}}},
            "host": {"args": {"data": {"train_data": [tables[1]]}}},
        },
        "algorithm_parameters": {
            "homo_nn_0": {
                "model": "mlp",
                "model_kwargs": {"features": [8, 3]},
                "secure_aggregate": "flashe",
                "secure_aggregate_args": {
                    "quantize": {"int_bits": 20, "batch": False,
                                 "element_bits": 16, "padding": True,
                                 "secure": True}},
                "max_iter": 2,
                "batch_size": 8,
                "cv_param": {"need_cv": True, "n_splits": 2,
                             "shuffle": True, "random_seed": 3},
            }
        },
    }
    out = run_dsl_job(DSL, conf, store=store)
    for role in ("guest", "host0"):
        cv = out[role]["homo_nn_0"]["cv"]
        assert cv["n_splits"] == 2
        assert len(cv["folds"]) == 2
        for fold in cv["folds"]:
            assert fold["n_train"] + fold["n_test"] == 24
            assert np.isfinite(fold["loss"])
        assert 0.0 <= cv["mean_acc"] <= 1.0
    arb = out["arbiter"]["homo_nn_0"]
    assert arb["n_splits"] == 2
    # one full aggregation session ran per fold
    assert [len(h) for h in arb["loss_histories"]] == [2, 2]
