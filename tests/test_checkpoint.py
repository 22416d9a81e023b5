"""Checkpoint/resume: model + aggregate_iter + quantizer stats roundtrip."""

import os

import numpy as np
import jax.numpy as jnp

from flashe_tpu.nn.models import MLP, init_params
from flashe_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    model = MLP(features=(8, 4))
    params = init_params(model, jnp.zeros((2, 16)), seed=0)
    path = os.path.join(tmp_path, "ckpt.bin")
    stats = {"past_mean": np.arange(3, dtype=np.float32),
             "past_std": np.ones(3, np.float32)}
    save_checkpoint(path, params, aggregate_iter=7, quantizer_stats=stats)

    template = init_params(model, jnp.zeros((2, 16)), seed=99)
    loaded = load_checkpoint(path, template)
    assert loaded["aggregate_iter"] == 7
    np.testing.assert_array_equal(loaded["quantizer_stats"]["past_mean"],
                                  stats["past_mean"])
    # weights restored exactly (seed-99 template fully overwritten)
    got = jnp.concatenate([x.ravel() for x in
                           __import__("jax").tree_util.tree_leaves(
                               loaded["params"])])
    want = jnp.concatenate([x.ravel() for x in
                            __import__("jax").tree_util.tree_leaves(params)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_load_model_restores_client(tmp_path):
    """HomoNNClient.load_model restores weights + aggregate_iter
    (reference load_model, enter_point.py:262-269)."""
    import numpy as np

    from flashe_tpu.nn.homo_nn import HomoNNGuest
    from flashe_tpu.runtime.config import HomoNNParam

    param = HomoNNParam.from_dict(
        {"model": "mlp", "max_iter": 1, "secure_aggregate": "plain"})
    x = np.random.RandomState(0).randn(4, 32).astype(np.float32)

    src = HomoNNGuest(param, seed=0)
    src._build(x[:1])
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, src.trainer.params, aggregate_iter=5)

    dst = HomoNNGuest(param, seed=9)
    dst.load_model(path, x[:1])
    assert dst.aggregate_iter == 5
    np.testing.assert_array_equal(
        np.asarray(dst.predict(x)), np.asarray(src.predict(x)))
