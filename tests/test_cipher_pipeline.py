"""FlasheCipher + quantizer end-to-end (single process, no protocol)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flashe_tpu.crypto.flashe import FlasheCipher, merge_idx_runs
from flashe_tpu.nn.weights import WeightsCodec
from flashe_tpu.ops.lanes import lane_add
from flashe_tpu.quant.quantizer import QuantizingClient

SEED = bytes(range(32))


def _template(rng):
    return {
        "dense/kernel": jnp.asarray(rng.randn(17, 9).astype(np.float32)),
        "dense/bias": jnp.asarray(rng.randn(9).astype(np.float32)),
        "conv/kernel": jnp.asarray(rng.randn(3, 3, 4).astype(np.float32)),
    }


def _make_cipher(idx, n_clients, int_bits=20, mask="double"):
    c = FlasheCipher(int_bits, mask=mask)
    c.idx = idx
    c.set_num_clients(n_clients)
    c.generate_prp_seed(assigned_seed=SEED)
    c.set_iter_index(0)
    return c


@pytest.mark.parametrize("mask", ["double", "single"])
def test_quantize_encrypt_aggregate_decrypt(mask):
    n_clients, int_bits, eb = 5, 20, 16
    rng = np.random.RandomState(0)
    template = _template(rng)
    codec = WeightsCodec(template)

    models = [
        {k: v + 0.01 * rng.randn(*v.shape).astype(np.float32)
         for k, v in template.items()}
        for _ in range(n_clients)
    ]

    ciphers, quantizers, cts = [], [], []
    for i in range(n_clients):
        q = QuantizingClient(int_bits, batch=False, element_bits=eb,
                             padding=True, secure=True, seed=i)
        q.set_codec(codec)
        q.set_num_clients(n_clients)
        c = _make_cipher(i, n_clients, int_bits, mask)
        flat = codec.flatten(models[i])
        lanes = q.quantize(q.normalize(flat))
        cts.append(c.encrypt(lanes))
        ciphers.append(c)
        quantizers.append(q)

    agg = cts[0]
    for ct in cts[1:]:
        agg = lane_add(agg, ct, int_bits)

    dec = ciphers[0].decrypt(agg)
    out = quantizers[0].unquantize(dec)
    out = out / n_clients
    out = quantizers[0].unnormalize(out)

    want = np.mean(
        [np.asarray(codec.flatten(m)) for m in models], axis=0
    )
    alpha_mean = float(np.mean(quantizers[0].alpha))
    step = 2 * alpha_mean / ((1 << eb) - 1)
    assert np.max(np.abs(np.asarray(out) - want)) < step * 2


def test_precompute_matches_direct():
    n_clients, int_bits = 3, 20
    n = 50
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randint(0, 1 << 16, n).astype(np.uint32))

    direct = _make_cipher(1, n_clients)
    pre = _make_cipher(1, n_clients)
    pre.set_num_params(n)
    pre.set_iter_index(-1)
    pre.prepare_encrypt()  # prepares iter 0 (setup-time bootstrap)
    pre.set_iter_index(0)
    np.testing.assert_array_equal(
        np.asarray(direct.encrypt(q)), np.asarray(pre.encrypt(q))
    )

    pre.prepare_decrypt()
    ct = direct.encrypt(q)
    np.testing.assert_array_equal(
        np.asarray(direct.decrypt(ct)), np.asarray(pre.decrypt(ct))
    )


def test_merge_idx_runs():
    assert merge_idx_runs([0, 1, 3]) == ([2, 4], [0, 3])
    assert merge_idx_runs([0, 1, 2]) == ([3], [0])
    assert merge_idx_runs([2]) == ([3], [2])


def test_dropout_decrypt_with_cipher():
    n_clients, int_bits, n = 4, 20, 40
    rng = np.random.RandomState(2)
    qs = [jnp.asarray(rng.randint(0, 1 << 16, n).astype(np.uint32))
          for _ in range(n_clients)]
    ciphers = [_make_cipher(i, n_clients) for i in range(n_clients)]
    survivors = [0, 2, 3]
    agg = None
    for i in survivors:
        ct = ciphers[i].encrypt(qs[i])
        agg = ct if agg is None else lane_add(agg, ct, int_bits)
    dec = ciphers[0].decrypt(agg, idx_list=survivors)
    want = (
        sum(np.asarray(qs[i], dtype=np.int64) for i in survivors)
        % (1 << int_bits)
    )
    np.testing.assert_array_equal(np.asarray(dec, np.int64), want)


@pytest.mark.parametrize("mask", ["double", "single"])
def test_sparse_decrypt(mask):
    """Compacted encrypt -> dense scatter -> masked decrypt."""
    n_clients, int_bits, total = 3, 20, 30
    rng = np.random.RandomState(3)
    zero_fill = 7
    locs = [np.sort(rng.choice(total, 10, replace=False)) for _ in range(n_clients)]
    qs = [rng.randint(0, 1 << 16, 10).astype(np.uint32) for _ in range(n_clients)]

    ciphers = [_make_cipher(i, n_clients, int_bits, mask) for i in range(n_clients)]
    dense_sum = np.zeros(total, np.int64)
    for i in range(n_clients):
        ct = np.asarray(ciphers[i].encrypt(jnp.asarray(qs[i])), np.int64)
        dense = np.full(total, zero_fill, np.int64)  # quantized-zero filler
        dense[locs[i]] = ct
        dense_sum = (dense_sum + dense) % (1 << int_bits)

    dec_cipher = ciphers[0]
    dec_cipher.set_masks(locs, total)
    dec = dec_cipher.decrypt(jnp.asarray(dense_sum.astype(np.uint32)))

    want = np.full(total, 0, np.int64)
    for i in range(n_clients):
        dense = np.full(total, zero_fill, np.int64)
        dense[locs[i]] = qs[i]
        want = (want + dense) % (1 << int_bits)
    np.testing.assert_array_equal(np.asarray(dec, np.int64), want)
