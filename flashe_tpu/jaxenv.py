"""Process-level JAX setup shared by every entry point.

Two concerns, applied before the first trace:

- backend selection: the container's sitecustomize registers the TPU
  backend at interpreter start, so ``--cpu`` flags must flip
  ``jax_platforms`` via config (env vars are too late);
- the persistent compilation cache: the bitsliced AES stream program
  costs tens of seconds of XLA compile time (minutes through the
  remote-TPU tunnel), and a federated job pays it once per *role
  subprocess*.  With the on-disk cache only the first process ever
  compiles; everyone else deserializes (cache keys include the backend,
  so CPU and TPU share one directory).
"""

from __future__ import annotations

import os

_DONE = False


def setup(force_cpu: bool = False) -> None:
    """Idempotent; safe to call from any entry point, any number of times.

    Must run before the first jit trace for the cache to apply to it
    (later calls still help later compiles)."""
    global _DONE
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    if _DONE:
        return
    cache = os.environ.get("FLASHE_JAX_CACHE", "/tmp/flashe_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass  # older jax without the persistent cache: compile-only
    _DONE = True
