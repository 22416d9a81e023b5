"""Model checkpoint/resume.

Reference scope (enter_point.py:202-216, 262-269): export the model weights
plus meta including `aggregate_iter`; restore resumes the federation loop
from that iteration.  Cipher state (PRP seed) is per-job and deliberately
NOT checkpointed, as in the reference.  Improvement over the reference: the
optimizer state and the quantizer's running layer statistics are saved too,
so a resumed job quantizes identically to an uninterrupted one.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, params, aggregate_iter: int,
                    opt_state=None, quantizer_stats: Dict[str, Any] | None = None):
    blob = {
        "params": serialization.to_bytes(params),
        "aggregate_iter": aggregate_iter,
        "opt_state": None if opt_state is None
        else serialization.to_bytes(opt_state),
        "quantizer_stats": {
            k: np.asarray(v) for k, v in (quantizer_stats or {}).items()
        },
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_template, opt_state_template=None):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    params = serialization.from_bytes(params_template, blob["params"])
    opt_state = None
    if blob.get("opt_state") is not None and opt_state_template is not None:
        opt_state = serialization.from_bytes(opt_state_template,
                                             blob["opt_state"])
    return {
        "params": params,
        "aggregate_iter": blob["aggregate_iter"],
        "opt_state": opt_state,
        "quantizer_stats": blob.get("quantizer_stats", {}),
    }
