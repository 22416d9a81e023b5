"""On-chip regression gate (`FLASHE_TESTS_TPU=1 pytest -m tpu`).

Runs the correctness contracts that bench.py's `correct` flags used to be
the only on-device witness for (SURVEY §4's golden-vector strategy, on
real hardware): golden mask vectors against the host PRP oracle, the
FLASHE telescoping identity, Pallas-vs-XLA kernel equality, party-mesh
bit-exactness (multi-chip hosts only), and a Paillier CRT roundtrip.
Every test skips unless the process holds a real TPU backend, so the
default CPU suite is unaffected.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="on-chip gate: needs a TPU backend (FLASHE_TESTS_TPU=1)"),
]

SEED = bytes(range(11, 43))


def _cipher(idx, num_clients, int_bits=20, n_shards=None):
    from flashe_tpu.crypto.flashe import FlasheCipher

    c = FlasheCipher(int_bits)
    c.idx = idx
    c.set_num_clients(num_clients)
    c.set_iter_index(3)
    c.generate_prp_seed(assigned_seed=SEED)
    if n_shards:
        c.set_local_devices(n_shards)
    return c


@pytest.mark.parametrize("int_bits", [16, 20, 128])
def test_golden_masks_on_chip(int_bits):
    """Device mask stream == host AES-PRP oracle (jzf_flashe.py:48-82)."""
    from flashe_tpu.ops import aes, lanes, masks

    rk = aes.key_schedule(SEED)
    count = 129
    got = np.asarray(masks.prp_lane_stream(rk, 3, 2, count, int_bits))
    want = masks.reference_mask_stream_host(SEED, 3, 2, count, int_bits)
    if got.ndim == 2:  # wide lanes arrive as limb arrays
        got_ints = lanes.lanes_to_ints(got, int_bits)
        np.testing.assert_array_equal(got_ints, want)
    else:
        np.testing.assert_array_equal(got.astype(object), want)


def test_telescoping_identity_on_chip():
    """enc -> lane-add -> boundary decrypt == mod-sum on real hardware."""
    from flashe_tpu.ops.lanes import lane_add

    int_bits, nc, n = 20, 4, 8192
    rng = np.random.RandomState(7)
    q = rng.randint(0, 1 << 16, (nc, n)).astype(np.uint32)
    ciphers = [_cipher(i, nc, int_bits) for i in range(nc)]
    agg = None
    for i, c in enumerate(ciphers):
        ct = c.encrypt(jnp.asarray(q[i]))
        agg = ct if agg is None else lane_add(agg, ct, int_bits)
    dec = np.asarray(ciphers[0].decrypt(agg)).astype(np.int64)
    want = q.astype(np.int64).sum(0) % (1 << int_bits)
    np.testing.assert_array_equal(dec, want)


def test_pallas_encrypt_matches_xla_on_chip():
    """The fused Pallas kernel (compiled, not interpret) == the XLA
    mask-stream path, bit for bit."""
    from flashe_tpu.ops import aes, masks
    from flashe_tpu.ops import pallas_flashe as pf

    int_bits = 20
    count = pf.tile_lanes_for(int_bits) + 123  # spans two tiles
    rk = aes.key_schedule(SEED).astype(np.int32)
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randint(0, 1 << 16, count).astype(np.uint32))

    got = np.asarray(pf.pallas_encrypt(q, rk, 4, 2, int_bits))

    add = np.asarray(masks.prp_lane_stream(rk, 4, 2, count, int_bits),
                     np.int64)
    minus = np.asarray(masks.prp_lane_stream(rk, 4, 3, count, int_bits),
                       np.int64)
    want = (np.asarray(q, np.int64) + add - minus) % (1 << int_bits)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_pallas_mont_mul_matches_xla_on_chip():
    """Compiled Pallas CIOS Montgomery multiply == XLA mont_mul."""
    from flashe_tpu.ops import modmath
    from flashe_tpu.ops.pallas_modmath import pallas_mont_mul

    rng = np.random.RandomState(5)
    n = 0
    while n % 2 == 0:
        n = int(rng.randint(1, 1 << 62)) | (1 << 511)
    ctx = modmath.MontCtx(n)
    vals_a = [int(rng.randint(0, 1 << 60)) % n for _ in range(9)]
    vals_b = [int(rng.randint(0, 1 << 60)) % n for _ in range(9)]
    a = jnp.asarray(modmath.to_limbs(vals_a, ctx.L))
    b = jnp.asarray(modmath.to_limbs(vals_b, ctx.L))
    want = np.asarray(modmath.mont_mul(ctx, a, b))
    got = np.asarray(pallas_mont_mul(ctx, a, b))
    np.testing.assert_array_equal(got, want)


def test_party_mesh_bit_exact_on_chip():
    """Sharded party encrypt == single-device encrypt on real chips
    (skips on a 1-chip host — there is no local mesh to shard over)."""
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip(f"party mesh needs >=2 local devices, have {n_dev}")
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randint(0, 1 << 16, 4000).astype(np.uint32))
    single = _cipher(idx=1, num_clients=3)
    party = _cipher(idx=1, num_clients=3, n_shards=n_dev)
    np.testing.assert_array_equal(
        np.asarray(single.encrypt(q)), np.asarray(party.encrypt(q)))


def test_paillier_crt_roundtrip_on_chip():
    """Device-kernel Paillier encrypt -> homomorphic add -> CRT decrypt."""
    from flashe_tpu.crypto import paillier

    c = paillier.PaillierCipher()
    c.generate_key(n_length=512)
    rng = np.random.RandomState(2)
    batches = [np.array([int(v) for v in rng.randint(0, 1 << 30, 4)],
                        dtype=object) for _ in range(3)]
    cts = [c.encrypt(b) for b in batches]
    agg = c.add_ciphertexts(cts)
    dec = c.decrypt(agg)
    want = [int(sum(b[i] for b in batches)) for i in range(4)]
    assert list(dec) == want
