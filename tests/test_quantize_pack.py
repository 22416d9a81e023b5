"""Quantizer codec + wire packing tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flashe_tpu.ops import pack, quantize
from flashe_tpu.ops.lanes import lanes_to_ints, ints_to_lanes


def test_quantize_roundtrip_error_bound():
    key = jax.random.PRNGKey(0)
    eb, n_clients = 16, 10
    rng = np.random.RandomState(0)
    x = rng.randn(4096).astype(np.float32) * 0.1
    alpha = 0.5
    q = quantize.quantize_asym(jnp.asarray(x), alpha, eb, key)
    assert int(q.max()) <= (1 << eb) - 1
    # single client: unquantize with n=1
    x2 = quantize.unquantize_asym(q, alpha, eb, 1)
    step = 2 * alpha / ((1 << eb) - 1)
    assert float(jnp.max(jnp.abs(x2 - jnp.asarray(x)))) <= step * 1.001


def test_quantized_sum_unquantizes_to_mean_sum():
    # sum of n quantized clients -> unquantize_asym recovers sum of x
    key = jax.random.PRNGKey(1)
    eb, n = 16, 7
    rng = np.random.RandomState(1)
    xs = [rng.randn(2048).astype(np.float32) * 0.2 for _ in range(n)]
    alpha = 1.0
    qs = []
    for i, x in enumerate(xs):
        qs.append(
            quantize.quantize_asym(
                jnp.asarray(x), alpha, eb, jax.random.fold_in(key, i)
            ).astype(jnp.uint32)  # sum of 7 16-bit values fits in uint32
        )
    qsum = sum(qs)
    got = quantize.unquantize_asym(qsum, alpha, eb, n)
    want = np.sum(xs, axis=0)
    step = 2 * alpha / ((1 << eb) - 1)
    # stochastic rounding: error per client <= 1 step
    assert np.max(np.abs(np.asarray(got) - want)) <= n * step * 1.001


def test_two_complement_roundtrip():
    v = jnp.asarray([-5, -1, 0, 1, 7], jnp.int32)
    enc = quantize.true_to_two(v, 8)
    dec = quantize.two_to_true(enc, 8)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(v))


@pytest.mark.parametrize("int_bits,eb,factor", [(20, 16, 4), (120, 16, 4), (64, 8, 2)])
def test_batch_unbatch_roundtrip(int_bits, eb, factor):
    rng = np.random.RandomState(2)
    n = 50
    q = jnp.asarray(rng.randint(0, 1 << eb, n).astype(np.uint32))
    lanes = quantize.batch_lanes(q, int_bits, eb, factor)
    back = quantize.unbatch_lanes(lanes, n, int_bits, eb, factor)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(q))


def test_batch_layout_matches_reference():
    # element 0 most significant within a lane (jzf_quantize.py:176-181)
    int_bits, eb, factor = 120, 16, 4
    ebf, bs = eb + factor, 120 // 20
    rng = np.random.RandomState(3)
    q = rng.randint(0, 1 << eb, bs).astype(np.uint32)
    lanes = quantize.batch_lanes(jnp.asarray(q), int_bits, eb, factor)
    got = lanes_to_ints(np.asarray(lanes), int_bits)[0]
    want = 0
    for v in q:
        want = want * (1 << ebf) + int(v)
    assert got == want


@pytest.mark.parametrize("int_bits", [16, 20, 27, 32, 120])
def test_pack_matches_reference_bigint(int_bits):
    rng = np.random.RandomState(4)
    n = 37
    vals = [rng.randint(0, 1 << min(int_bits, 62)) for _ in range(n)]
    lanes = ints_to_lanes(np.array(vals, dtype=object), int_bits)
    data = pack.pack_lanes(lanes, int_bits)
    assert len(data) == pack.packed_nbytes(n, int_bits)
    # oracle: reference big-int concatenation (jzf_weights.py:45-84)
    s = pack.pack_ints_reference(vals, int_bits)
    assert int.from_bytes(data, "big") == s
    back = pack.unpack_lanes(data, n, int_bits)
    np.testing.assert_array_equal(
        lanes_to_ints(back, int_bits), np.array(vals, dtype=object)
    )


def test_numpy_codec_twins_match_jnp():
    """batch_lanes_np / unbatch_lanes_np are bit-identical to the jnp
    path (they exist so host-driven codecs skip device round trips)."""
    import jax.numpy as jnp

    from flashe_tpu.ops import quantize as qops

    rng = np.random.RandomState(3)
    for int_bits, eb, factor, n in [(2048, 16, 4, 1000), (20, 16, 4, 777),
                                    (64, 16, 4, 333)]:
        q = rng.randint(0, 1 << (eb + factor), n).astype(np.uint32)
        a = np.asarray(qops.batch_lanes(jnp.asarray(q), int_bits, eb,
                                        factor))
        b = qops.batch_lanes_np(q, int_bits, eb, factor)
        np.testing.assert_array_equal(a, b)
        ua = np.asarray(qops.unbatch_lanes(jnp.asarray(a), n, int_bits,
                                           eb, factor))
        ub = qops.unbatch_lanes_np(b, n, int_bits, eb, factor)
        np.testing.assert_array_equal(ua, ub)
        np.testing.assert_array_equal(ub, q & np.uint32((1 << 20) - 1))
