"""Stock FATE random-padding secure aggregation (PadsCipher).

The reference keeps FATE's original masking scheme alongside FLASHE
(federatedml/framework/homo/procedure/random_padding_cipher.py,
secureprotol/random.py RandomPads): after the DH exchange, every client
pair (i, j) shares a secret; client i adds +pad_ij if uuid_i < uuid_j else
-pad_ij for every peer, where pad_ij is a PRG stream seeded from the
shared secret.  Pairwise pads cancel in the arbiter's sum, so — unlike
FLASHE — there is no decryption step, but every client does O(n) pad
generations and dropout is not survivable.  Kept for parity and as a
comparison point.

The PRG here is jax threefry keyed by the shared secret (the reference
uses numpy MT19937 seeded by `secret & 0xFFFFFFFF` — not reproduced
bit-for-bit; masking is random either way).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["RandomPads", "PadsCipher"]


class RandomPads:
    """Seeded pad streams (reference secureprotol/random.py:20-45)."""

    def __init__(self, init_seed: int = 0):
        self._key = jax.random.PRNGKey(init_seed & 0xFFFFFFFF)
        self._counter = 0

    def _next(self):
        self._counter += 1
        return jax.random.fold_in(self._key, self._counter)

    def rand(self, *shape):
        return jax.random.uniform(self._next(), shape, dtype=jnp.float32)

    def randn(self, *shape):
        return jax.random.normal(self._next(), shape, dtype=jnp.float32)

    def add_randn_pads(self, a, w):
        return a + self.randn(*a.shape) * w

    def add_rand_pads(self, a, w):
        return a + self.rand(*a.shape) * w


class PadsCipher:
    """Pairwise-cancelling additive masking."""

    def __init__(self):
        self.uuid = None
        self._pads = None  # list of (sign, RandomPads)

    def set_self_uuid(self, uuid):
        self.uuid = uuid

    def set_exchanged_keys(self, exchanged_keys: dict):
        """exchanged_keys: {uuid: (idx, shared_secret, role, comm_idx)}."""
        self._pads = []
        for uid, tup in exchanged_keys.items():
            if uid == self.uuid:
                continue
            secret = int(tup[1])
            sign = 1.0 if str(self.uuid) < str(uid) else -1.0
            self._pads.append((sign, RandomPads(secret)))

    def encrypt(self, flat: jnp.ndarray) -> jnp.ndarray:
        """Add all pairwise pads; the arbiter's sum cancels them."""
        out = jnp.asarray(flat, jnp.float32)
        for sign, pads in self._pads:
            out = out + sign * pads.randn(*out.shape)
        return out

    # the aggregate of all clients is already the plaintext sum
    def decrypt(self, flat, idx_list=None):
        return flat
