"""Versioned model storage (fate_flow model_manager / load / bind
analogue, fate_flow/manager/model_manager.py)."""

import numpy as np
import pytest

from flashe_tpu.runtime.model_manager import ModelManager


def _params(seed):
    rng = np.random.RandomState(seed)
    return {"dense": {"kernel": rng.randn(4, 3).astype(np.float32),
                      "bias": rng.randn(3).astype(np.float32)}}


def _assert_params_equal(a, b):
    np.testing.assert_allclose(a["dense"]["kernel"], b["dense"]["kernel"])
    np.testing.assert_allclose(a["dense"]["bias"], b["dense"]["bias"])


def test_save_load_versions(tmp_path):
    mm = ModelManager(str(tmp_path))
    p1, p2 = _params(1), _params(2)
    mm.save("guest#0#mlp", "job_a", p1, aggregate_iter=3,
            param_dict={"model": "mlp"})
    mm.save("guest#0#mlp", "job_b", p2, aggregate_iter=7)

    got = mm.load("guest#0#mlp", "job_a", _params(0))
    _assert_params_equal(got["params"], p1)
    assert got["aggregate_iter"] == 3
    assert got["meta"]["param"] == {"model": "mlp"}

    versions = [m["version"] for m in mm.list_versions("guest#0#mlp")]
    assert versions == ["job_a", "job_b"]

    with pytest.raises(KeyError):
        mm.load("guest#0#mlp", "nope", _params(0))


def test_bind_and_latest(tmp_path):
    mm = ModelManager(str(tmp_path))
    mm.save("ns", "v1", _params(1), aggregate_iter=1)
    mm.save("ns", "v2", _params(2), aggregate_iter=2)

    # unbound -> newest by creation time
    assert mm.load_latest("ns", _params(0))["aggregate_iter"] == 2

    mm.bind("ns", "v1")
    assert mm.bound_version("ns") == "v1"
    got = mm.load_latest("ns", _params(0))
    assert got["aggregate_iter"] == 1
    _assert_params_equal(got["params"], _params(1))

    with pytest.raises(KeyError):
        mm.bind("ns", "missing")

    assert mm.delete("ns", "v1")
    assert mm.bound_version("ns") is None
    assert not mm.delete("ns", "v1")


def test_rejects_path_traversal(tmp_path):
    mm = ModelManager(str(tmp_path))
    with pytest.raises(ValueError):
        mm.save("../evil", "v", _params(0), aggregate_iter=0)
    with pytest.raises(ValueError):
        mm.load("ns", "a/b", _params(0))
