"""In-process multi-role simulation.

Replaces the reference's TestSyncBase fixture
(federatedml/framework/test/homo/homo_test_sync_base.py:25-108, one OS
process per role over standalone eggroll) with one thread per role over the
in-memory broker.  Exceptions propagate to the caller with the failing
role attached.
"""

from __future__ import annotations

import threading
from typing import Callable, Dict

from flashe_tpu.fed.inmem import InMemBroker, InMemFederation
from flashe_tpu.fed.transport import default_parties
from flashe_tpu.fed.variables import HomoTransferVariables
from flashe_tpu.runtime.tracking import Tracker, set_tracker

__all__ = ["run_roles"]


def run_roles(n_hosts: int, guest_fn: Callable, host_fn: Callable,
              arbiter_fn: Callable, job_id: str = "sim") -> Dict[str, object]:
    """Run guest/host/arbiter callables concurrently; return their results.

    guest_fn(trv), host_fn(trv, host_idx), arbiter_fn(trv); each thread
    gets its own HomoTransferVariables bound to its party.
    """
    from flashe_tpu.runtime.permission import effective_authorization

    broker = InMemBroker()
    parties = default_parties(n_hosts)
    auth = effective_authorization()

    results: Dict[str, object] = {}
    errors: Dict[str, BaseException] = {}

    def _wrap(name, party, fn, *args):
        def run():
            set_tracker(Tracker(name))
            try:
                fed = InMemFederation(broker, job_id, party, parties, auth)
                trv = HomoTransferVariables(fed)
                results[name] = fn(trv, *args)
            except BaseException as e:  # noqa: BLE001 - surface to caller
                errors[name] = e
        return threading.Thread(target=run, name=name, daemon=True)

    threads = [
        _wrap("guest", parties[0], guest_fn),
        _wrap("arbiter", parties[-1], arbiter_fn),
    ]
    for h in range(n_hosts):
        threads.append(_wrap(f"host{h}", parties[1 + h], host_fn, h))

    for t in threads:
        t.start()
    for t in threads:
        # poll so a crashed role surfaces immediately instead of leaving
        # the other roles blocked on gets that will never be answered
        deadline = 900
        while t.is_alive():
            t.join(timeout=1.0)
            deadline -= 1
            if errors:
                name, err = next(iter(errors.items()))
                raise RuntimeError(f"role {name} failed: {err!r}") from err
            if deadline <= 0:
                raise TimeoutError(f"role thread {t.name} did not finish")
    if errors:
        name, err = next(iter(errors.items()))
        raise RuntimeError(f"role {name} failed: {err!r}") from err
    return results
