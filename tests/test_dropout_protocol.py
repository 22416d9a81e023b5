"""Protocol-level dropout: a host crashes mid-round; the survivors'
aggregate stays decryptable (FLASHE double masking, README claim #3)."""

import numpy as np
import pytest
import jax.numpy as jnp

from flashe_tpu.nn.weights import WeightsCodec
from flashe_tpu.protocol import aggregator
from flashe_tpu.runtime.simulate import run_roles

N_HOSTS = 2  # host1 will crash


@pytest.mark.slow
def test_host_dropout_survivors_decrypt():
    rng = np.random.RandomState(0)
    template = {"w": rng.randn(11, 3).astype(np.float32) * 0.1}
    codec = WeightsCodec(template)
    flats = [template["w"].ravel() + 0.02 * rng.randn(33).astype(np.float32)
             for _ in range(N_HOSTS + 1)]

    args = {
        "quantize": {"int_bits": 20, "batch": False, "element_bits": 16,
                     "padding": True, "secure": True},
        "precompute": {"enable": False},
        "mode": "parallel", "num_partitions": 1,
        "upload_timeout_s": 5.0,
    }

    def client(agg, my_flat):
        agg.set_codec(codec)
        out = agg.aggregate_then_get(jnp.asarray(my_flat), iter_index=0,
                                     degree=1.0, suffix=(0,))
        return np.asarray(out)

    def guest(trv):
        return client(
            aggregator.Guest().register_aggregator(
                trv, secure_aggregate="flashe", secure_aggregate_args=args),
            flats[0])

    def host(trv, hid):
        agg = aggregator.Host().register_aggregator(
            trv, secure_aggregate="flashe", secure_aggregate_args=args)
        if hid == 1:
            return "crashed"  # participates in setup, then dies mid-round
        return client(agg, flats[1 + hid])

    def arbiter(trv):
        agg = aggregator.Arbiter().register_aggregator(
            trv, secure_aggregate="flashe", secure_aggregate_args=args)
        agg.aggregate_and_broadcast(iter_index=0, suffix=(0,))
        return list(agg.dropped_hosts)

    results = run_roles(N_HOSTS, guest, host, arbiter)
    assert results["arbiter"] == [1]
    # survivors (guest + host0) reconstruct the 2-party FedAvg
    want = np.mean([flats[0], flats[1]], axis=0)
    assert np.max(np.abs(results["guest"] - want)) < 5e-4
    np.testing.assert_allclose(results["guest"], results["host0"], atol=1e-6)


def _run_rejoin(args, slow_host=1, sleep_s=25.0, rounds=2):
    """Host `slow_host` sleeps through round 0's deadline (alive, not
    dead), is dropped, still receives the survivors' aggregate via the
    dropped control frame (keeping its quantizer statistics in sync), and
    contributes again at round 1.

    The survivors sleep the same amount before round 1 (standing in for
    local training time) so the arbiter's round-1 collection window opens
    after the slow host has woken, uploaded, and become collectable —
    without that, an arbiter with nothing else to do reaches the round-1
    deadline before the slow host recovers."""
    import time

    rng = np.random.RandomState(42)
    template = {"w": rng.randn(11, 3).astype(np.float32) * 0.1}
    codec = WeightsCodec(template)
    base = template["w"].ravel()
    # per-client "local training" delta applied to the current global model
    deltas = [0.02 * rng.randn(33).astype(np.float32)
              for _ in range(N_HOSTS + 1)]

    def client_rounds(agg, delta, slow=False):
        agg.set_codec(codec)
        flat = base.copy()
        outs = []
        for r in range(rounds):
            if slow and r == 0:
                time.sleep(sleep_s)
            if not slow and r == 1:
                time.sleep(sleep_s)
            out = agg.aggregate_then_get(jnp.asarray(flat + delta),
                                         iter_index=r, degree=1.0,
                                         suffix=(r,))
            assert out is not None
            flat = np.asarray(out)
            outs.append((flat, agg.was_dropped))
        return outs

    def guest(trv):
        agg = aggregator.Guest().register_aggregator(
            trv, secure_aggregate="flashe", secure_aggregate_args=args)
        return client_rounds(agg, deltas[0])

    def host(trv, hid):
        agg = aggregator.Host().register_aggregator(
            trv, secure_aggregate="flashe", secure_aggregate_args=args)
        return client_rounds(agg, deltas[1 + hid], slow=(hid == slow_host))

    def arbiter(trv):
        agg = aggregator.Arbiter().register_aggregator(
            trv, secure_aggregate="flashe", secure_aggregate_args=args)
        dropped = []
        for r in range(rounds):
            agg.aggregate_and_broadcast(iter_index=r, suffix=(r,))
            dropped.append(list(agg.dropped_hosts))
        return dropped

    results = run_roles(N_HOSTS, guest, host, arbiter)

    # round 0: slow host dropped; survivors average; the dropped host
    # still receives the identical global model, flagged was_dropped
    assert results["arbiter"][0] == [slow_host]
    slow_flat0, slow_was_dropped = results[f"host{slow_host}"][0]
    assert slow_was_dropped
    assert not results["guest"][0][1]
    global0 = base + np.mean([deltas[0], deltas[1]], axis=0)
    assert np.max(np.abs(results["guest"][0][0] - global0)) < 5e-4
    np.testing.assert_allclose(slow_flat0, results["guest"][0][0], atol=1e-6)

    # round 1: everyone contributes again (rejoin), bit-identical models,
    # and the slow host's delta is back in the average
    assert results["arbiter"][1] == []
    global1 = results["guest"][0][0] + np.mean(deltas, axis=0)
    for role in ("guest", "host0", f"host{slow_host}"):
        flat1, was_dropped1 = results[role][1]
        assert not was_dropped1, role
        np.testing.assert_allclose(flat1, results["guest"][1][0], atol=1e-6)
    assert np.max(np.abs(results["guest"][1][0] - global1)) < 1e-3


@pytest.mark.slow
def test_slow_host_dropped_notified_rejoins():
    """A slow (not dead) host unblocks via the dropped control frame and
    rejoins the next round (VERDICT r2 item 6)."""
    _run_rejoin({
        "quantize": {"int_bits": 20, "batch": False, "element_bits": 16,
                     "padding": True, "secure": True},
        "precompute": {"enable": False},
        "mode": "parallel", "num_partitions": 1,
        "upload_timeout_s": 5.0,
    })


@pytest.mark.slow
def test_slow_host_dropped_partitioned_upload():
    """Dropout under num_partitions > 1: the host misses its partition-0
    deadline, is answered on upload_result, aborts the partitioned upload,
    drains the agg_model notice, and rejoins next round."""
    _run_rejoin({
        "quantize": {"int_bits": 20, "batch": False, "element_bits": 16,
                     "padding": True, "secure": True},
        "precompute": {"enable": False},
        "mode": "parallel", "num_partitions": 2,
        "upload_timeout_s": 5.0,
    })
