"""Federated NN training end-to-end: HomoNN roles over the in-memory
federation with FLASHE secure aggregation (the reference's full pipeline,
enter_point.py + jzf_aggregator.py)."""

import numpy as np
import pytest

from flashe_tpu.data import federated_dataset
from flashe_tpu.nn.homo_nn import HomoNNArbiter, HomoNNGuest, HomoNNHost
from flashe_tpu.runtime.config import (
    HomoNNParam, QuantizeConfig, SecureAggregateArgs,
)
from flashe_tpu.runtime.simulate import run_roles

N_HOSTS = 2


def _param(**kw):
    defaults = dict(
        model="mlp",
        model_kwargs={"features": (16, 10)},
        secure_aggregate="flashe",
        secure_aggregate_args=SecureAggregateArgs(
            quantize=QuantizeConfig(int_bits=20, element_bits=16),
        ),
        optimizer="adam",
        learning_rate=5e-3,
        max_iter=3,
        batch_size=32,
    )
    defaults.update(kw)
    return HomoNNParam(**defaults)


def test_federated_training_flashe():
    shards = federated_dataset("mlp", N_HOSTS + 1, 96, seed=0)
    param = _param()

    def guest(trv):
        c = HomoNNGuest(param, seed=0)
        c.fit(trv, *shards[0])
        return c.history

    def host(trv, hid):
        c = HomoNNHost(param, seed=1 + hid)
        c.fit(trv, *shards[1 + hid])
        return c.history

    def arbiter(trv):
        a = HomoNNArbiter(param)
        return a.fit(trv)

    results = run_roles(N_HOSTS, guest, host, arbiter)
    losses = results["arbiter"]
    assert len(losses) == param.max_iter
    # training on a linearly separable synthetic task must reduce loss
    assert losses[-1] < losses[0]
    # all clients ended at the same global model accuracy trajectory
    g_acc = [h["acc"] for h in results["guest"]]
    h_acc = [h["acc"] for h in results["host0"]]
    assert len(g_acc) == len(h_acc) == param.max_iter


def test_federated_training_plain_matches_flashe_roughly():
    """Plain and FLASHE aggregation should produce similar trajectories
    (crypto adds only quantization noise)."""
    shards = federated_dataset("mlp", N_HOSTS + 1, 96, seed=0)

    def run(scheme):
        param = _param(
            secure_aggregate=scheme,
            secure_aggregate_args=SecureAggregateArgs(
                quantize=QuantizeConfig(int_bits=20, element_bits=16)),
            max_iter=2,
        )

        def guest(trv):
            c = HomoNNGuest(param, seed=0)
            c.fit(trv, *shards[0])
            return [h["loss"] for h in c.history]

        def host(trv, hid):
            c = HomoNNHost(param, seed=1 + hid)
            c.fit(trv, *shards[1 + hid])
            return None

        def arbiter(trv):
            return HomoNNArbiter(param).fit(trv)

        return run_roles(N_HOSTS, guest, host, arbiter)["guest"]

    flashe_losses = run("flashe")
    plain_losses = run("plain")
    assert abs(flashe_losses[-1] - plain_losses[-1]) < 0.3
