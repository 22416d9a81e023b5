"""A federated party that owns a multi-device slice.

The reference scales one silo's crypto across all its CPU cores with a
`multiprocessing.Pool` over contiguous index chunks
(federatedml/secureprotol/jzf_flashe.py:436-447).  The TPU-native
composition is: the *protocol* path (flashe_tpu/protocol, TCP or in-mem
federation between WAN silos) stays unchanged, while each party's
encrypt/decrypt shards its flattened lane vector over a local 1-D
device mesh via `shard_map` — counter-offset mask generation
(ops/masks.py `begin_block`) makes every shard produce exactly its
slice of the PRP stream, so the sharded ciphertext is bit-identical to
the single-device one (asserted in tests/test_party_mesh.py).

This is the BASELINE north-star scaling story (1 chip -> 1 host -> N
hosts *per party*): a silo with 4 chips encrypts 4x faster yet speaks
the exact same wire protocol.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from flashe_tpu.parallel.sharded import (
    decrypt_shard_runs, encrypt_shard, padded_lane_count)

__all__ = ["LocalLaneMesh"]


@functools.partial(jax.jit, static_argnames=("mesh", "int_bits"))
def _party_encrypt(mesh, rk, q, iter_index, stream_idx, int_bits):
    """Double-mask encrypt of a (N_pad,) lane vector sharded over the
    local `lanes` axis; N_pad from padded_lane_count."""

    def worker(rk, it, sidx, qb):
        s = jax.lax.axis_index("lanes")
        return encrypt_shard(rk, qb, it, sidx, s, int_bits)

    return shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), P(), P("lanes")),
        out_specs=P("lanes"),
    )(rk, iter_index, stream_idx, q)


@functools.partial(
    jax.jit, static_argnames=("mesh", "int_bits", "adds", "minuses"))
def _party_decrypt(mesh, rk, agg, iter_index, int_bits, adds, minuses):
    """Run-boundary decrypt of an aggregated (N_pad,) lane vector sharded
    over the local `lanes` axis (adds/minuses: static tuples from
    crypto.flashe.merge_idx_runs)."""

    def worker(rk, it, aggb):
        s = jax.lax.axis_index("lanes")
        return decrypt_shard_runs(rk, aggb, it, adds, minuses, s, int_bits)

    return shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), P("lanes")),
        out_specs=P("lanes"),
    )(rk, iter_index, agg)


class LocalLaneMesh:
    """1-D `lanes` mesh over a party's local devices.

    Install on a FlasheCipher with `cipher.set_local_devices(...)`; the
    cipher then routes dense double-mask encrypt/decrypt through
    shard_map while leaving the protocol, sparsity and limb paths
    untouched.
    """

    def __init__(self, n_shards=None, devices=None):
        devices = list(devices if devices is not None else
                       jax.local_devices())
        if n_shards in (None, "all"):
            n_shards = len(devices)
        n_shards = int(n_shards)
        if n_shards > len(devices):
            raise ValueError(
                f"local_lane_shards={n_shards} > {len(devices)} local "
                f"devices")
        self.n_shards = n_shards
        self.mesh = Mesh(np.asarray(devices[:n_shards]), ("lanes",))
        self._sharding = NamedSharding(self.mesh, P("lanes"))

    def _pad(self, v, int_bits):
        n = v.shape[0]
        n_pad = padded_lane_count(n, int_bits, self.n_shards)
        if n_pad != n:
            v = jnp.concatenate(
                [jnp.asarray(v), jnp.zeros(n_pad - n, v.dtype)])
        return jax.device_put(jnp.asarray(v), self._sharding)

    def encrypt(self, rk, q, iter_index, stream_idx, int_bits):
        n = q.shape[0]
        qp = self._pad(q, int_bits)
        out = _party_encrypt(self.mesh, rk, qp, jnp.asarray(iter_index,
                             jnp.int32), jnp.asarray(stream_idx, jnp.int32),
                             int_bits)
        return out[:n]

    def decrypt_runs(self, rk, agg, iter_index, adds, minuses, int_bits):
        n = agg.shape[0]
        ap = self._pad(agg, int_bits)
        out = _party_decrypt(self.mesh, rk, ap,
                             jnp.asarray(iter_index, jnp.int32), int_bits,
                             tuple(adds), tuple(minuses))
        return out[:n]
