"""Guest+hosts gather with role/ordinal tagging.

Reference framework/homo/util/jzf_scatter.py:40-50 — the jzf variant
appends ("guest", 0) / ("host", host_id) so the arbiter can assign stable
ordinal indices during the DH exchange.
"""

from __future__ import annotations

__all__ = ["Scatter"]


class Scatter:
    def __init__(self, host_variable, guest_variable):
        self._host = host_variable
        self._guest = guest_variable

    def get(self, suffix=tuple(), host_ids=None, tagged=True):
        guest_val = self._guest.get(idx=0, suffix=suffix)
        if tagged:
            yield tuple(guest_val) + ("guest", 0)
        else:
            yield guest_val
        if host_ids is None or host_ids == -1:
            n = len(self._host.roles_to_parties(["host"]))
            host_ids = list(range(n))
        for hid in host_ids:
            val = self._host.get(idx=hid, suffix=suffix)
            if tagged:
                yield tuple(val) + ("host", hid)
            else:
                yield val
