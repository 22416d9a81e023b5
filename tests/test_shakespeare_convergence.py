"""Real-data convergence: the HomoNN component trains the reference's
Shakespeare next-char workload (examples/dataset/shakespeare_10) under
FLASHE secure aggregation and the loss strictly decreases over 5 rounds
(VERDICT r2 item 3's CI-sized check).

Uses a shrunken GRU (the full 512/256 define is the experiment script's
job, examples/shakespeare_experiment.py) but the real dataset, the real
nn_define interpreter path, and the real cipher pipeline.
"""

import os

import numpy as np
import pytest

from flashe_tpu.data import shakespeare
from flashe_tpu.nn.homo_nn import HomoNNArbiter, HomoNNGuest, HomoNNHost
from flashe_tpu.runtime.config import (
    HomoNNParam, QuantizeConfig, SecureAggregateArgs,
)
from flashe_tpu.runtime.simulate import run_roles

N_HOSTS = 2
ROUNDS = 5

pytestmark = pytest.mark.skipif(
    not os.path.isdir(shakespeare.DEFAULT_ROOT),
    reason="reference shakespeare_10 dataset not present")


@pytest.mark.slow
def test_shakespeare_flashe_loss_decreases():
    shards = shakespeare.load_clients(n_clients=N_HOSTS + 1, limit=96)
    define = {
        "class_name": "Sequential",
        "config": {"name": "lstm", "layers": [
            {"class_name": "Embedding",
             "config": {"name": "embedding", "input_dim": 83,
                        "output_dim": 24, "mask_zero": True,
                        "input_length": 80}},
            {"class_name": "GRU",
             "config": {"name": "gru", "units": 32,
                        "return_sequences": True}},
            {"class_name": "Dense",
             "config": {"name": "dense", "units": 83,
                        "activation": "linear"}},
        ]},
    }
    param = HomoNNParam(
        model="nn_define", model_kwargs={"nn_define": define},
        secure_aggregate="flashe",
        secure_aggregate_args=SecureAggregateArgs(
            quantize=QuantizeConfig(int_bits=20, element_bits=16)),
        optimizer="adam", learning_rate=0.01, max_iter=ROUNDS,
        batch_size=32, label_pad_id=0, loss="sparse_categorical_crossentropy")

    def guest(trv):
        c = HomoNNGuest(param, seed=0)
        c.fit(trv, *shards[0])
        return c.history

    def host(trv, hid):
        c = HomoNNHost(param, seed=1 + hid)
        c.fit(trv, *shards[1 + hid])
        return c.history

    def arbiter(trv):
        return HomoNNArbiter(param).fit(trv)

    results = run_roles(N_HOSTS, guest, host, arbiter)
    losses = results["arbiter"]
    assert len(losses) == ROUNDS
    # strict decrease on the real dataset over 5 rounds
    for a, b in zip(losses, losses[1:]):
        assert b < a, losses
    # each client's own-shard eval loss also improved end-to-end
    for role in ("guest", "host0", "host1"):
        hist = [h["loss"] for h in results[role]]
        assert hist[-1] < hist[0], (role, hist)
