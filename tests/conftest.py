"""Test configuration.

Default: run everything on a virtual 8-device CPU mesh.  The container's
sitecustomize registers the axon TPU backend at interpreter start, so
JAX_PLATFORMS env alone is not enough — the platform must be forced
through jax.config before first backend use.

On-chip gate: `FLASHE_TESTS_TPU=1 python -m pytest tests/ -m tpu` keeps
the real TPU backend and runs only the `tpu`-marked regression subset
(tests/test_tpu_gate.py) — golden mask vectors, telescoping identity,
Pallas-vs-XLA equality, party-mesh bit-exactness, Paillier CRT roundtrip
— turning "bench said ok" into a pinned on-device gate.
"""

import os

_TPU_GATE = os.environ.get("FLASHE_TESTS_TPU") == "1"

if not _TPU_GATE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if _TPU_GATE:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/flashe_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/flashe_jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    assert jax.devices()[0].platform == "cpu", \
        "tests must run on CPU devices"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

# keep the job registry / dataset store out of the real home dir unless a
# test overrides them explicitly
import tempfile  # noqa: E402

_state = tempfile.mkdtemp(prefix="flashe_test_state_")
os.environ.setdefault("FLASHE_JOBS_DIR", os.path.join(_state, "jobs"))
os.environ.setdefault("FLASHE_DATA_DIR", os.path.join(_state, "data"))
os.environ.setdefault("FLASHE_MODELS_DIR", os.path.join(_state, "models"))
os.environ.setdefault("FLASHE_PERMISSIONS_PATH",
                      os.path.join(_state, "permissions.json"))
