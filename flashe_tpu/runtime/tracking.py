"""Phase tracking and metrics.

Reproduces the reference's observability surface in library form:
- paired begin/end phase timing (the reference's LOGGER.info("begin X") /
  ("end X") instrumentation across jzf_aggregator.py / jzf_quantize.py,
  which produced the paper's phase breakdown: encoding / encryption /
  upload / download / decryption / decoding),
- a per-thread metrics sink (`Tracker`) standing in for fate_flow's
  MySQL-backed Tracking (fate_flow/manager/tracking.py): components call
  `callback_metric`, runners read `tracker().metrics`.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from collections import defaultdict

__all__ = ["phase", "tracker", "Tracker", "set_tracker"]

LOGGER = logging.getLogger("flashe_tpu")

_local = threading.local()


class Tracker:
    def __init__(self, name: str = ""):
        self.name = name
        self.phase_totals = defaultdict(float)
        self.phase_counts = defaultdict(int)
        self.metrics = []  # list of (name, step, value)

    def record_phase(self, name: str, seconds: float):
        self.phase_totals[name] += seconds
        self.phase_counts[name] += 1

    def callback_metric(self, metric_name: str, step, value):
        self.metrics.append((metric_name, step, value))

    def summary(self) -> dict:
        return {
            k: {"total_s": v, "count": self.phase_counts[k]}
            for k, v in sorted(self.phase_totals.items())
        }


def tracker() -> Tracker:
    t = getattr(_local, "tracker", None)
    if t is None:
        t = Tracker()
        _local.tracker = t
    return t


def set_tracker(t: Tracker):
    _local.tracker = t


@contextlib.contextmanager
def phase(name: str):
    """Paired begin/end wall timing, accumulated per thread."""
    LOGGER.debug("begin %s", name)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        tracker().record_phase(name, dt)
        LOGGER.debug("end %s (%.4fs)", name, dt)
