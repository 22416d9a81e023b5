"""TCP broker federation: multi-threaded parties over real sockets,
including >4MB payload fragmentation (the reference's splitable transfer,
arch/api/utils/splitable.py:48).  Runs against both the native C++
exchange (native/fedbroker.cpp) and the pure-Python fallback broker."""

import threading

import numpy as np
import pytest

from flashe_tpu import native
from flashe_tpu.fed.consts import ARBITER, GUEST, HOST
from flashe_tpu.fed.tcp import FedBroker, TcpFederation
from flashe_tpu.fed.transport import Party, default_parties
from flashe_tpu.fed.variables import HomoTransferVariables


@pytest.mark.parametrize("use_native", [False, True])
def test_tcp_roundtrip_and_fragmentation(use_native):
    if use_native and native.broker_binary() is None:
        pytest.skip("no compiler for the native broker")
    broker = FedBroker(native=use_native)
    assert (broker._proc is not None) == use_native
    parties = default_parties(n_hosts=1)
    auth = HomoTransferVariables.authorization()

    results = {}

    def guest():
        fed = TcpFederation(broker.address, "job", parties[0], parties, auth)
        trv = HomoTransferVariables(fed)
        big = np.arange(2_000_000, dtype=np.float64)  # ~16MB -> 4 fragments
        trv.guest_to_arbiter.remote(obj=big, role=ARBITER, idx=0,
                                    suffix=("big",))
        results["guest_got"] = trv.arbiter_to_guest.get(idx=0,
                                                        suffix=("ack",))
        fed.close()

    def host():
        fed = TcpFederation(broker.address, "job", parties[1], parties, auth)
        trv = HomoTransferVariables(fed)
        trv.host_to_arbiter.remote(obj={"hello": 1}, role=ARBITER, idx=0,
                                   suffix=("small",))
        fed.close()

    def arbiter():
        fed = TcpFederation(broker.address, "job", parties[2], parties, auth)
        trv = HomoTransferVariables(fed)
        big = trv.guest_to_arbiter.get(idx=0, suffix=("big",), timeout=60)
        small = trv.host_to_arbiter.get(idx=-1, suffix=("small",), timeout=60)
        results["big_sum"] = float(big.sum())
        results["small"] = small
        trv.arbiter_to_guest.remote(obj="ok", role=GUEST, idx=0,
                                    suffix=("ack",))
        fed.close()

    threads = [threading.Thread(target=f, daemon=True)
               for f in (guest, host, arbiter)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive()
    broker.close()

    assert results["guest_got"] == "ok"
    assert results["small"] == [{"hello": 1}]
    assert results["big_sum"] == float(np.arange(2_000_000).sum())


@pytest.mark.parametrize("use_native", [False, True])
def test_tcp_buffered_before_registration(use_native):
    """Frames to a not-yet-connected party are held at the exchange and
    flushed on registration (the reference's pull-based recv analogue)."""
    if use_native and native.broker_binary() is None:
        pytest.skip("no compiler for the native broker")
    broker = FedBroker(native=use_native)
    parties = default_parties(n_hosts=1)
    auth = HomoTransferVariables.authorization()
    guest = TcpFederation(broker.address, "jobB", parties[0], parties, auth)
    trv_g = HomoTransferVariables(guest)
    payload = np.arange(1_500_000, dtype=np.float64)  # 12MB -> 3 fragments
    trv_g.guest_to_arbiter.remote(obj=payload, role=ARBITER, idx=0,
                                  suffix=("early",))
    trv_g.guest_to_arbiter.remote(obj="tail", role=ARBITER, idx=0,
                                  suffix=("late",))
    # arbiter connects only after both sends completed
    arb = TcpFederation(broker.address, "jobB", parties[2], parties, auth)
    trv_a = HomoTransferVariables(arb)
    got = trv_a.guest_to_arbiter.get(idx=0, suffix=("early",), timeout=30)
    assert np.array_equal(got, payload)
    assert trv_a.guest_to_arbiter.get(idx=0, suffix=("late",),
                                      timeout=30) == "tail"
    guest.close()
    arb.close()
    broker.close()


def test_tcp_authorization_enforced():
    broker = FedBroker()
    parties = default_parties(n_hosts=1)
    auth = HomoTransferVariables.authorization()
    fed = TcpFederation(broker.address, "job2", parties[0], parties, auth)
    trv = HomoTransferVariables(fed)
    try:
        # guest may not send on an arbiter->host channel
        import pytest

        with pytest.raises(PermissionError):
            trv.arbiter_to_host.remote(obj=1, role=HOST, idx=0)
    finally:
        fed.close()
        broker.close()


def test_transfer_stats_counts_wire_bytes():
    """TransferStat mirrors the proxy's StreamStat: per-variable message
    and wire-byte counters on both ends."""
    broker = FedBroker(native=False)
    parties = default_parties(n_hosts=1)
    auth = HomoTransferVariables.authorization()
    guest = TcpFederation(broker.address, "jobS", parties[0], parties, auth)
    arb = TcpFederation(broker.address, "jobS", parties[2], parties, auth)
    trv_g = HomoTransferVariables(guest)
    trv_a = HomoTransferVariables(arb)

    payload = np.zeros(1_000_000)  # 8MB -> 2 fragments
    trv_g.guest_to_arbiter.remote(obj=payload, role=ARBITER, idx=0,
                                  suffix=("s",))
    trv_a.guest_to_arbiter.get(idx=0, suffix=("s",), timeout=30)

    gs = guest.stats.summary()["guest_to_arbiter"]
    assert gs["sent_msgs"] == 1
    assert gs["sent_bytes"] > payload.nbytes  # wire bytes >= payload
    ar = arb.stats.summary()["guest_to_arbiter"]
    assert ar["recv_msgs"] == 1
    assert ar["recv_bytes"] > payload.nbytes
    assert arb.stats.summary()["__total__"]["recv_msgs"] == 1
    guest.close(); arb.close(); broker.close()
