"""Multi-role protocol rounds for the general-HE baselines
(paillier / bfv / ckks), small parameters for CI speed."""

import numpy as np
import jax.numpy as jnp
import pytest

from flashe_tpu.nn.weights import WeightsCodec
from flashe_tpu.protocol import aggregator
from flashe_tpu.runtime.simulate import run_roles

pytestmark = pytest.mark.slow  # HE kernels: minutes on CPU; run in the full suite

N_HOSTS = 2
N_CLIENTS = N_HOSTS + 1


def _setup():
    rng = np.random.RandomState(0)
    template = {
        "w": rng.randn(9, 5).astype(np.float32) * 0.1,
        "b": rng.randn(5).astype(np.float32) * 0.1,
    }
    codec = WeightsCodec(template)
    base = np.concatenate([template[k].ravel() for k in sorted(template)])
    flats = [base + 0.02 * rng.randn(base.size).astype(np.float32)
             for _ in range(N_CLIENTS)]
    return codec, flats


def _round(scheme, args, atol):
    codec, flats = _setup()

    def client(agg, my_flat):
        agg.set_codec(codec)
        out = agg.aggregate_then_get(jnp.asarray(my_flat), iter_index=0,
                                     degree=1.0, suffix=(0,))
        return np.asarray(out)

    def guest(trv):
        return client(
            aggregator.Guest().register_aggregator(
                trv, secure_aggregate=scheme, secure_aggregate_args=args),
            flats[0])

    def host(trv, hid):
        return client(
            aggregator.Host().register_aggregator(
                trv, secure_aggregate=scheme, secure_aggregate_args=args),
            flats[1 + hid])

    def arbiter(trv):
        aggregator.Arbiter().register_aggregator(
            trv, secure_aggregate=scheme, secure_aggregate_args=args
        ).aggregate_and_broadcast(iter_index=0, suffix=(0,))

    results = run_roles(N_HOSTS, guest, host, arbiter)
    want = np.mean(flats, axis=0)
    for role in ("guest", "host0", "host1"):
        assert np.max(np.abs(results[role] - want)) < atol, role
    np.testing.assert_allclose(results["guest"], results["host0"], atol=1e-6)


def test_paillier_round():
    args = {
        "key_length": 512,
        "quantize": {"int_bits": 500, "batch": True, "element_bits": 16,
                     "padding": True, "secure": True},
        "mode": "parallel", "num_partitions": 1,
    }
    _round("paillier", args, atol=5e-4)


def test_paillier_round_serial_partitioned():
    args = {
        "key_length": 512,
        "quantize": {"int_bits": 500, "batch": True, "element_bits": 16,
                     "padding": True, "secure": True},
        "mode": "serial", "num_partitions": 1,
    }
    _round("paillier", args, atol=5e-4)


def test_bfv_round():
    args = {
        "p": 1964769281, "m": 64, "sec": 128, "flagBatching": True,
        "quantize": {"int_bits": 20, "batch": False, "element_bits": 16,
                     "padding": True, "secure": True},
        "mode": "parallel", "num_partitions": 1,
    }
    _round("bfv", args, atol=5e-4)


def test_ckks_round():
    args = {
        "poly_modulus_degree": 64,
        "mode": "parallel", "num_partitions": 1,
    }
    _round("ckks", args, atol=1e-4)


def test_additive_round():
    """Reconstructed additive random-mask scheme (the reference's missing
    jzf_additive_mask_block): pads cancel in the arbiter's plain sum."""
    args = {"mode": "parallel", "num_partitions": 1}
    _round("additive", args, atol=1e-4)
