"""Multi-role protocol end-to-end: guest + hosts + arbiter over the
in-memory federation (the reference's TestSyncBase pattern,
federatedml/framework/test/homo/aggregator_test.py:46-62)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flashe_tpu.nn.weights import WeightsCodec
from flashe_tpu.protocol import aggregator
from flashe_tpu.runtime.simulate import run_roles

N_HOSTS = 2
N_CLIENTS = N_HOSTS + 1
ROUNDS = 2


def _models(seed, scale=0.1):
    rng = np.random.RandomState(seed)
    template = {
        "w1": rng.randn(13, 7).astype(np.float32) * scale,
        "b1": rng.randn(7).astype(np.float32) * scale,
    }
    return template


def _flashe_args(precompute=None, mask=None, num_partitions=1,
                 mode="parallel", wire_pack=False):
    args = {
        "quantize": {"int_bits": 20, "batch": False, "element_bits": 16,
                     "padding": True, "secure": True},
        "precompute": precompute or {"enable": False},
        "mode": mode,
        "num_partitions": num_partitions,
        "wire_pack": wire_pack,
    }
    if mask:
        args["mask"] = mask
    return args


def _run_rounds(scheme, args, sparsity=1.0, n_rounds=ROUNDS):
    templates = [_models(i) for i in range(N_CLIENTS)]
    codec = WeightsCodec(templates[0])
    flats = [np.concatenate([t[k].ravel() for k in sorted(t)]).astype(np.float32)
             for t in templates]

    def client_rounds(agg, flat0):
        agg.set_codec(codec)
        flat = jnp.asarray(flat0)
        outs = []
        for r in range(n_rounds):
            before = flat
            out = agg.aggregate_then_get(flat, iter_index=r, before=before,
                                         degree=1.0, suffix=(r,))
            agg.send_loss(0.5, degree=1.0, suffix=(r,))
            agg.get_converge_status(suffix=(r, "conv"))
            flat = out
            outs.append(np.asarray(out))
        return outs

    def guest(trv):
        agg = aggregator.Guest().register_aggregator(
            trv, sparsity=sparsity, secure_aggregate=scheme,
            secure_aggregate_args=args)
        return client_rounds(agg, flats[0])

    def host(trv, hid):
        agg = aggregator.Host().register_aggregator(
            trv, sparsity=sparsity, secure_aggregate=scheme,
            secure_aggregate_args=args)
        return client_rounds(agg, flats[1 + hid])

    def arbiter(trv):
        agg = aggregator.Arbiter().register_aggregator(
            trv, sparsity=sparsity, secure_aggregate=scheme,
            secure_aggregate_args=args)
        for r in range(n_rounds):
            agg.aggregate_and_broadcast(iter_index=r, suffix=(r,))
            agg.aggregate_loss(suffix=(r,))
            agg.send_converge_status(lambda: False, (), suffix=(r, "conv"))
        return None

    results = run_roles(N_HOSTS, guest, host, arbiter)
    return results, flats


@pytest.mark.parametrize(
    "args",
    [
        _flashe_args(),
        _flashe_args(precompute={"enable": True, "num_params": 13 * 7 + 7}),
        _flashe_args(num_partitions=2, wire_pack=True),
        _flashe_args(mode="serial"),
    ],
    ids=["basic", "precompute", "partitioned+wire", "serial"],
)
def test_flashe_round_matches_fedavg(args):
    results, flats = _run_rounds("flashe", args)
    want = np.mean(flats, axis=0)
    for role in ["guest", "host0", "host1"]:
        got = results[role][0]
        assert np.max(np.abs(got - want)) < 5e-4, role
    # all parties converge to the same global model in round 2
    np.testing.assert_allclose(results["guest"][1], results["host0"][1],
                               atol=1e-6)


def test_plain_quantized_round():
    args = {
        "quantize": {"int_bits": 20, "batch": False, "element_bits": 16,
                     "padding": True, "secure": True},
        "mode": "parallel", "num_partitions": 1,
    }
    results, flats = _run_rounds("plain", args)
    want = np.mean(flats, axis=0)
    assert np.max(np.abs(results["guest"][0] - want)) < 5e-4


@pytest.mark.slow
def test_flashe_batched_lanes_round():
    args = _flashe_args()
    args["quantize"]["int_bits"] = 120
    args["quantize"]["batch"] = True
    results, flats = _run_rounds("flashe", args)
    want = np.mean(flats, axis=0)
    assert np.max(np.abs(results["guest"][0] - want)) < 5e-4


@pytest.mark.slow
def test_flashe_sparse_dynamic_round():
    """Sparse rounds ship top-s% deltas vs the COMMON previous global model
    (jzf_aggregator.py:699-703: before = weights_last_round)."""
    args = _flashe_args(mask="dynamic")
    base_t = _models(100)
    codec = WeightsCodec(base_t)
    base = np.concatenate(
        [base_t[k].ravel() for k in sorted(base_t)]).astype(np.float32)
    rng = np.random.RandomState(7)
    flats = [base + 0.05 * rng.randn(base.size).astype(np.float32)
             for _ in range(N_CLIENTS)]

    def client(agg, my_flat):
        agg.set_codec(codec)
        out = agg.aggregate_then_get(
            jnp.asarray(my_flat), iter_index=0,
            before=jnp.asarray(base), degree=1.0, suffix=(0,))
        return np.asarray(out)

    def guest(trv):
        agg = aggregator.Guest().register_aggregator(
            trv, sparsity=0.3, secure_aggregate="flashe",
            secure_aggregate_args=args)
        return client(agg, flats[0])

    def host(trv, hid):
        agg = aggregator.Host().register_aggregator(
            trv, sparsity=0.3, secure_aggregate="flashe",
            secure_aggregate_args=args)
        return client(agg, flats[1 + hid])

    def arbiter(trv):
        agg = aggregator.Arbiter().register_aggregator(
            trv, sparsity=0.3, secure_aggregate="flashe",
            secure_aggregate_args=args)
        agg.aggregate_and_broadcast(iter_index=0, suffix=(0,))
        return None

    results = run_roles(N_HOSTS, guest, host, arbiter)
    g = results["guest"]
    assert np.all(np.isfinite(g))
    # every client reconstructs the same new global model
    np.testing.assert_allclose(g, results["host0"], atol=1e-6)
    np.testing.assert_allclose(g, results["host1"], atol=1e-6)
    # selected coordinates moved toward the client deltas; unselected
    # stay within quantization noise of the base
    assert np.max(np.abs(g - base)) < 0.2


@pytest.mark.slow
def test_paillier_sparse_round():
    """Sparsity composes with Paillier via the encrypted-zero filler (the
    reference's cnn_paillier_q16_b1_pad_s100 config: the 'zzz' quantized
    zero passes through weights.encrypted, jzf_aggregator.py:716-743, so
    the arbiter densifies with a ciphertext filler and multiplies mod n^2
    as usual)."""
    args = {
        "quantize": {"int_bits": 20, "batch": False, "element_bits": 16,
                     "padding": True, "secure": True},
        "mode": "parallel", "num_partitions": 1,
        "key_length": 512,  # keep the test fast; 2048 in production
    }
    base_t = _models(200)
    codec = WeightsCodec(base_t)
    base = np.concatenate(
        [base_t[k].ravel() for k in sorted(base_t)]).astype(np.float32)
    rng = np.random.RandomState(17)
    flats = [base + 0.05 * rng.randn(base.size).astype(np.float32)
             for _ in range(N_CLIENTS)]

    def client(agg, my_flat):
        agg.set_codec(codec)
        out = agg.aggregate_then_get(
            jnp.asarray(my_flat), iter_index=0,
            before=jnp.asarray(base), degree=1.0, suffix=(0,))
        return np.asarray(out)

    def guest(trv):
        agg = aggregator.Guest().register_aggregator(
            trv, sparsity=0.3, secure_aggregate="paillier",
            secure_aggregate_args=args)
        return client(agg, flats[0])

    def host(trv, hid):
        agg = aggregator.Host().register_aggregator(
            trv, sparsity=0.3, secure_aggregate="paillier",
            secure_aggregate_args=args)
        return client(agg, flats[1 + hid])

    def arbiter(trv):
        agg = aggregator.Arbiter().register_aggregator(
            trv, sparsity=0.3, secure_aggregate="paillier",
            secure_aggregate_args=args)
        agg.aggregate_and_broadcast(iter_index=0, suffix=(0,))
        return None

    results = run_roles(N_HOSTS, guest, host, arbiter)
    g = results["guest"]
    assert np.all(np.isfinite(g))
    np.testing.assert_allclose(g, results["host0"], atol=1e-6)
    np.testing.assert_allclose(g, results["host1"], atol=1e-6)
    assert np.max(np.abs(g - base)) < 0.2
