"""Protocol-level dropout: a host crashes mid-round; the survivors'
aggregate stays decryptable (FLASHE double masking, README claim #3)."""

import numpy as np
import jax.numpy as jnp

from flashe_tpu.nn.weights import WeightsCodec
from flashe_tpu.protocol import aggregator
from flashe_tpu.runtime.simulate import run_roles

N_HOSTS = 2  # host1 will crash


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
