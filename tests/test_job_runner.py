"""Full multi-process job: broker + guest/host/arbiter subprocesses over
TCP, FLASHE-aggregated federated training (the fate_flow-equivalent path).
"""

import numpy as np
import pytest

from flashe_tpu.data import federated_dataset
from flashe_tpu.runtime.config import (
    HomoNNParam, QuantizeConfig, SecureAggregateArgs,
)
from flashe_tpu.runtime.job import submit_job


@pytest.mark.slow
def test_multiprocess_job():
    shards = federated_dataset("mlp", 2, 64, seed=0)
    param = HomoNNParam(
        model="mlp",
        model_kwargs={"features": (8, 10)},
        secure_aggregate="flashe",
        secure_aggregate_args=SecureAggregateArgs(
            quantize=QuantizeConfig(int_bits=20, element_bits=16)),
        max_iter=1,
        batch_size=32,
        learning_rate=5e-3,
    )
    results = submit_job(
        param, shards, timeout=800,
        env_overrides={
            "JAX_PLATFORMS": "cpu",
            "FLASHE_FORCE_CPU": "1",
        })
    assert "arbiter_0" in results and len(results["arbiter_0"]["loss_history"]) == 1
    assert results["guest_0"]["history"][0]["loss"] > 0
    # phase profile recorded (encoding/encryption/upload/...)
    assert "encryption" in results["guest_0"]["phases"]
