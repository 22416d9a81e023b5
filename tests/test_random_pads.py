"""Stock random-padding secure aggregation: pairwise pads cancel in the sum
(reference random_padding_cipher.py + secureprotol/random.py)."""

import numpy as np
import jax.numpy as jnp

from flashe_tpu.crypto.random_pads import PadsCipher, RandomPads


def _exchanged(uuids, secrets):
    """Build the per-client exchanged_keys dicts with symmetric secrets."""
    out = {}
    for me in uuids:
        d = {}
        for idx, other in enumerate(uuids):
            key = tuple(sorted((me, other)))
            d[other] = (idx, secrets[key], "host", idx)
        out[me] = d
    return out


def test_pads_cancel_in_aggregate():
    uuids = ["a-1", "b-2", "c-3"]
    secrets = {}
    rng = np.random.RandomState(0)
    for i, u in enumerate(uuids):
        for v in uuids[i:]:
            secrets[tuple(sorted((u, v)))] = int(rng.randint(1, 1 << 30))
    exchanged = _exchanged(uuids, secrets)

    flats = [rng.randn(64).astype(np.float32) for _ in uuids]
    masked = []
    for u, flat in zip(uuids, flats):
        c = PadsCipher()
        c.set_self_uuid(u)
        c.set_exchanged_keys(exchanged[u])
        masked.append(np.asarray(c.encrypt(jnp.asarray(flat))))
        # each mask is far from the plaintext
        assert np.max(np.abs(masked[-1] - flat)) > 0.1

    agg = np.sum(masked, axis=0)
    want = np.sum(flats, axis=0)
    np.testing.assert_allclose(agg, want, atol=1e-4)


def test_random_pads_streams_deterministic():
    a = RandomPads(42)
    b = RandomPads(42)
    np.testing.assert_array_equal(np.asarray(a.randn(8)), np.asarray(b.randn(8)))
