"""SPMD mesh federation: N client processes train a shared model with
encrypted mesh aggregation (parallel/mesh_party.py).

Checks the two invariants that make the mode a real federation:
- learning happens: the federated eval loss strictly decreases,
- state converges: every process ends with the bit-identical global
  model (sha256 digest equality), which transitively certifies that the
  encrypted aggregate, the ACIQ scales, and the running-statistics
  updates agreed across processes at every round.
"""

import json
import os

import pytest

from flashe_tpu.parallel.multihost import launch_local

CHILD = os.path.join(os.path.dirname(__file__), "..", "flashe_tpu",
                     "parallel", "_mesh_party_child.py")


@pytest.mark.slow
def test_mesh_party_trains_and_converges():
    outs = launch_local(2, 2, CHILD, extra_args=["--rounds", "3"],
                        timeout=560)
    results = []
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("RESULT "))
        results.append(json.loads(line[len("RESULT "):]))

    digests = {r["model_digest"] for r in results}
    assert len(digests) == 1, "processes diverged"
    losses = results[0]["loss_history"]
    assert len(losses) == 3
    assert losses[-1] < losses[0], losses
    for r in results[1:]:
        assert r["loss_history"] == losses
