"""The paper-claims comparison harness (examples/compare_schemes.py)
produces the reference's claim structure from real measurements
(reference README.md:21-27; experiments/ + utils/batch_launch.py)."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_compare_schemes_claims(tmp_path):
    out = tmp_path / "cmp.json"
    subprocess.run(
        [sys.executable, "examples/compare_schemes.py", "--cpu",
         "--params", "2048", "--schemes", "plain,flashe,flashe+sparse",
         "--batches-per-round", "1", "--train-s", "1.0",
         "--out", str(out)],
        cwd=HERE, check=True, timeout=560)
    doc = json.loads(out.read_text())
    schemes = {r["scheme"]: r for r in doc["rows"]}
    assert set(schemes) == {"plain", "flashe", "flashe+sparse"}
    assert all(r["correct"] for r in doc["rows"])
    # flashe wire footprint is 20/32 of plaintext float32 (the 0%-traffic
    # overhead claim holds with margin)
    assert (schemes["flashe"]["wire_mb_per_client"]
            < schemes["plain"]["wire_mb_per_client"])
    assert doc["claims"]["overhead_vs_plain_traffic_pct"] < 0
    # sparse top-10% moves less than dense
    assert (schemes["flashe+sparse"]["wire_mb_per_client"]
            < schemes["flashe"]["wire_mb_per_client"])
    assert "overhead_vs_plain_time_pct" in doc["claims"]
