"""The FLASHE cipher: additively symmetric HE via PRP double masking.

TPU-native re-design of federatedml/secureprotol/jzf_flashe.py.  A
ciphertext is a uint32 lane array (limb vectors for int_bits > 32); all mask
generation/application is a fused JAX program (AES circuit -> lane extract
-> mod-2^m add), jitted per (count, int_bits).  Differences from the
reference, by design:

- masks live on device; "multiprocessing fan-out" becomes VPU vectorization
  and (optionally) sharding across a device mesh (flashe_tpu/parallel),
- mask precomputation exploits JAX async dispatch: `prepare_*` launches the
  device computation and returns immediately, so mask generation overlaps
  host-side communication exactly like the reference's idle-time
  precomputation (jzf_aggregator.py:820-826),
- aggregation is lane-wise modular addition (carry-exact), not whole-model
  big-int addition (see flashe_tpu/ops/lanes.py docstring),
- sparsified double masking regenerates per-client streams at *compact*
  counters and scatters them to dense positions, which is the consistent
  completion of the reference's exercised single-mask path
  (jzf_flashe.py:306-343); the reference's dense-counter double-mask
  reconstruction (jzf_flashe.py:387-426) does not match its compact-counter
  encryption and is not reproduced.

Protocol roles, key distribution and the (iter, idx, counter) index
structure are identical to the reference; see flashe_tpu/ops/masks.py for
the bit-exactness contract.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from flashe_tpu.ops import aes
from flashe_tpu.ops.lanes import lane_add, lane_sub, nlimbs_for
from flashe_tpu.ops.masks import prp_lane_stream

__all__ = ["FlasheCipher"]

_SEED_BITS = 256


@functools.lru_cache(maxsize=None)
def _stream_fn(count, int_bits, use_circuit):
    # AOT-compile one executable per static configuration and call it
    # directly.  The runtime's jit dispatch cache has been observed to
    # confuse executables of stream programs that differ only in the
    # static lane count ("Execution supplied N buffers but compiled
    # program expected M"); explicit lower().compile() sidesteps that
    # dispatch path entirely.
    def f(rk, iter_index, stream_idx):
        return prp_lane_stream(rk, iter_index, stream_idx, count, int_bits,
                               use_circuit=use_circuit)

    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    rk_s = jax.ShapeDtypeStruct((15, 16), jnp.int32)
    return jax.jit(f).lower(rk_s, i32, i32).compile()


def _stream(rk, iter_index, stream_idx, count, int_bits, use_circuit=True):
    return _stream_fn(count, int_bits, use_circuit)(
        jnp.asarray(rk, jnp.int32), jnp.asarray(iter_index, jnp.int32),
        jnp.asarray(stream_idx, jnp.int32))


@functools.lru_cache(maxsize=None)
def _dev_i32(v: int):
    """Device-resident int32 scalar, cached: iteration/stream indices are
    jit arguments, and re-uploading a scalar every call costs a full
    host->device round-trip (tens of ms on a remote-TPU tunnel)."""
    return jnp.asarray(v, jnp.int32)


@functools.lru_cache(maxsize=None)
def _fused_kernel_ok() -> bool:
    """Whether the fused Pallas mask kernel is usable: TPU backend only
    (Mosaic lowering; interpreter mode is far slower than the XLA path on
    CPU).  ~125x faster than the XLA stream path on TPU v5e — see
    flashe_tpu/ops/pallas_flashe.py and docs/BENCHMARKS.md."""
    if os.environ.get("FLASHE_NO_PALLAS") == "1":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("int_bits",))
def _mask_apply(value, add, minus, int_bits):
    return lane_sub(lane_add(value, add, int_bits), minus, int_bits)


@functools.partial(jax.jit, static_argnames=("int_bits",))
def _mask_apply_single(value, add, int_bits):
    return lane_add(value, add, int_bits)


@functools.partial(jax.jit, static_argnames=("int_bits",))
def _scatter_accumulate(acc, stream, locations, int_bits):
    """acc += scatter(stream at locations), mod 2^int_bits."""
    dense = jnp.zeros_like(acc).at[locations].set(stream)
    return lane_add(acc, dense, int_bits)


def merge_idx_runs(idx_list):
    """Run-merge surviving client indices into non-cancelling telescope
    boundaries (reference jzf_flashe.py:356-367).

    [0,1,3] -> add prefixes [2,4], minus prefixes [0,3].
    """
    adds, minuses = [], []
    for idx in sorted(idx_list):
        if adds and idx == adds[-1]:
            adds[-1] = idx + 1
        else:
            adds.append(idx + 1)
            minuses.append(idx)
    return adds, minuses


class FlasheCipher:
    """Session object owned by one client (guest or host).

    The arbiter never instantiates this class: it only lane-adds
    ciphertexts (flashe_tpu/protocol/aggregator.py), mirroring the
    reference where the arbiter holds no key material.
    """

    def __init__(self, int_bits: int, mask: str = "double",
                 use_circuit: bool = True):
        self.int_bits = int_bits
        self.masking_scheme = mask
        self.use_circuit = use_circuit

        self.uuid = None
        self.guest_uuid = None
        self.exchanged_keys = None
        self.idx = None  # ordinal index from the DH exchange

        self.prp_seed = None
        self._round_keys = None  # (15, 16) int32 device array

        self.iter_index = -1
        self.num_clients = None
        self.num_params = None  # lanes to precompute

        # sparsification state (dynamic masking hint)
        self.masks = None  # list of per-client dense location arrays
        self.total = None

        # precomputed mask streams: {("enc"|"dec", iter): (add, minus)}
        self._prepared = {}

        # optional multi-device party slice (parallel/party.LocalLaneMesh):
        # dense double-mask encrypt/decrypt shard over local devices
        self._party_mesh = None

    # -- session setup (mirrors jzf_flashe.py:262-304) ---------------------

    def set_self_uuid(self, uuid):
        self.uuid = uuid

    def set_exchanged_keys(self, exchanged_keys):
        self.exchanged_keys = exchanged_keys
        for k, v in exchanged_keys.items():
            if k == self.uuid:
                self.idx = v[0]
            elif v[2] == "guest":
                self.guest_uuid = k

    def get_guest_uuid(self):
        return self.guest_uuid

    def set_num_clients(self, num_clients: int):
        self.num_clients = num_clients

    def set_num_params(self, num_params: int):
        self.num_params = num_params

    def set_iter_index(self, iter_index: int):
        self.iter_index = iter_index

    def generate_prp_seed(self, assigned_seed=None):
        if assigned_seed is None:
            seed = os.urandom(_SEED_BITS // 8)
        elif isinstance(assigned_seed, int):
            seed = (assigned_seed & ((1 << _SEED_BITS) - 1)).to_bytes(
                _SEED_BITS // 8, "big"
            )
        else:
            seed = (
                int.from_bytes(assigned_seed, "big") & ((1 << _SEED_BITS) - 1)
            ).to_bytes(_SEED_BITS // 8, "big")
        self.prp_seed = seed
        self._round_keys = jnp.asarray(
            aes.key_schedule(seed).astype(np.int32)
        )

    def get_prp_seed(self):
        return self.prp_seed

    def get_idx_list(self):
        return [self.idx]

    def set_local_devices(self, n_shards=None, devices=None):
        """Give this party a multi-device slice (the reference's
        per-party Pool fan-out, jzf_flashe.py:436-447): dense
        double-mask AND single-mask encrypt/decrypt shard the lane
        vector across local devices via shard_map, and the sparse
        decrypt path fans per-client mask regeneration out by client
        (parallel/party.sparse_decrypt_fanout).  A 1-device mesh
        disables the route (nothing to shard)."""
        from flashe_tpu.parallel.party import LocalLaneMesh

        m = LocalLaneMesh(n_shards, devices)
        self._party_mesh = m if m.n_shards > 1 else None

    def _party_ok(self, value) -> bool:
        return (self._party_mesh is not None
                and self.masks is None
                and value.ndim == 1
                and nlimbs_for(self.int_bits) == 1)

    def set_masks(self, masks, total):
        """Install sparsity location lists (dynamic masking hint payload)."""
        self.masks = None if masks is None else [
            jnp.asarray(np.asarray(m, dtype=np.int32)) for m in masks
        ]
        self.total = total

    # -- mask streams ------------------------------------------------------

    def _s(self, stream_idx: int, count: int):
        return _stream(
            self._round_keys,
            _dev_i32(self.iter_index),
            _dev_i32(stream_idx),
            count,
            self.int_bits,
            self.use_circuit,
        )

    def _pallas_ok(self) -> bool:
        return (_fused_kernel_ok()
                and nlimbs_for(self.int_bits) == 1
                and self.masking_scheme == "double")

    def prepare_encrypt(self):
        """Precompute next round's encrypt masks (jzf_flashe.py:599-631).

        Async: jit dispatch returns immediately; the arrays materialize on
        device while the host does protocol work.  With the fused TPU
        kernel, mask generation is cheaper than reading precomputed masks
        back from HBM, so precomputation becomes a no-op there.
        """
        if (self._pallas_ok() or self._party_mesh is not None
                or self.num_params is None):
            return
        it = self.iter_index + 1
        rk, n = self._round_keys, self.num_params
        add = _stream(rk, _dev_i32(it), _dev_i32(self.idx), n,
                      self.int_bits, self.use_circuit)
        if self.masking_scheme == "double":
            minus = _stream(rk, _dev_i32(it), _dev_i32(self.idx + 1), n,
                            self.int_bits, self.use_circuit)
        else:
            minus = None
        self._prepared[("enc", it)] = (add, minus)

    def prepare_decrypt(self):
        """Precompute this round's aggregate-decrypt boundary masks
        (jzf_flashe.py:633-666): add at idx=num_clients, minus at idx=0."""
        if (self._pallas_ok() or self._party_mesh is not None
                or self.num_params is None):
            return
        it = self.iter_index
        add = self._s(self.num_clients, self.num_params)
        minus = self._s(0, self.num_params)
        self._prepared[("dec", it)] = (add, minus)

    # -- encrypt -----------------------------------------------------------

    def encrypt(self, value: jnp.ndarray) -> jnp.ndarray:
        """value: (n,) uint32 lanes or (n, L) limbs -> ciphertext lanes.

        c = (q + a_idx - a_{idx+1}) mod 2^int_bits  (double;
        jzf_flashe.py:480-481) or c = (q + a_idx) mod 2^m (single).
        """
        if self.prp_seed is None:
            return None
        n = value.shape[0]
        if self._party_ok(value):
            if self.masking_scheme == "double":
                return self._party_mesh.encrypt(
                    self._round_keys, value, self.iter_index, self.idx,
                    self.int_bits)
            return self._party_mesh.encrypt_single(
                self._round_keys, value, self.iter_index, self.idx,
                self.int_bits)
        key = ("enc", self.iter_index)
        prepared = self._prepared.pop(key, None)
        if prepared is None and self._pallas_ok():
            from flashe_tpu.ops.pallas_flashe import pallas_encrypt

            return pallas_encrypt(value, self._round_keys,
                                  _dev_i32(self.iter_index),
                                  _dev_i32(self.idx), self.int_bits)
        if prepared is not None and prepared[0].shape[0] >= n:
            add = prepared[0][:n]
            minus = None if prepared[1] is None else prepared[1][:n]
        else:
            add = self._s(self.idx, n)
            minus = (
                self._s(self.idx + 1, n)
                if self.masking_scheme == "double"
                else None
            )
        if self.masking_scheme == "double":
            return _mask_apply(value, add, minus, self.int_bits)
        return _mask_apply_single(value, add, self.int_bits)

    # -- decrypt -----------------------------------------------------------

    def decrypt(self, value: jnp.ndarray, idx_list=None) -> jnp.ndarray:
        """Decrypt an aggregate given the surviving client idx list.

        Dense path: run-merged boundary masks (jzf_flashe.py:354-386,
        537-582).  Sparse path (self.masks set): per-client compact-counter
        streams scattered to dense positions.
        """
        if self.prp_seed is None:
            return None
        if idx_list is None:
            idx_list = list(range(self.num_clients))

        if self.masks is not None:
            return self._decrypt_sparse(value, idx_list)

        if self._party_ok(value):
            if self.masking_scheme == "double":
                adds, minuses = merge_idx_runs(idx_list)
                return self._party_mesh.decrypt_runs(
                    self._round_keys, value, self.iter_index, adds,
                    minuses, self.int_bits)
            return self._party_mesh.decrypt_single(
                self._round_keys, value, self.iter_index, idx_list,
                self.int_bits)

        n = value.shape[0]
        if self.masking_scheme == "single":
            out = value
            for idx in idx_list:
                out = lane_sub(out, self._s(idx, n), self.int_bits)
            return out

        adds, minuses = merge_idx_runs(idx_list)
        out = value
        prepared = self._prepared.pop(("dec", self.iter_index), None)
        if prepared is not None and prepared[0].shape[0] >= n:
            pre_add, pre_minus = prepared
            if self.num_clients in adds:
                adds.remove(self.num_clients)
                out = lane_add(out, pre_add[:n], self.int_bits)
            if 0 in minuses:
                minuses.remove(0)
                out = lane_sub(out, pre_minus[:n], self.int_bits)
        if self._pallas_ok():
            from flashe_tpu.ops.pallas_flashe import pallas_mask_apply

            # merge_idx_runs yields paired boundaries; fuse each pair
            npairs = min(len(adds), len(minuses))
            for a, b in zip(adds[:npairs], minuses[:npairs]):
                out = pallas_mask_apply(out, self._round_keys,
                                        _dev_i32(self.iter_index),
                                        _dev_i32(a), _dev_i32(b),
                                        self.int_bits)
            adds, minuses = adds[npairs:], minuses[npairs:]
        for idx in adds:
            out = lane_add(out, self._s(idx, n), self.int_bits)
        for idx in minuses:
            out = lane_sub(out, self._s(idx, n), self.int_bits)
        return out

    def _decrypt_sparse(self, value: jnp.ndarray, idx_list) -> jnp.ndarray:
        """Undo per-client compact-counter masks on a dense aggregate.

        Client i encrypted its compacted top-s% vector with stream counters
        0..len(loc_i)-1; the arbiter scattered it to dense positions loc_i
        (aggregator expand_to_dense, jzf_aggregator.py:150-165).  So the
        dense aggregate carries +a_i(compact) [- b_i(compact) for double]
        at positions loc_i for every surviving client i.
        """
        if nlimbs_for(self.int_bits) > 1:
            raise NotImplementedError(
                "sparsified decryption requires int_bits <= 32 "
                "(batch mode and sparsification are mutually exclusive "
                "in the reference configs as well)"
            )
        if self._party_mesh is not None and len(idx_list) > 1:
            from flashe_tpu.parallel.party import sparse_decrypt_fanout

            return sparse_decrypt_fanout(
                self._party_mesh.devices, self._round_keys, value,
                self.iter_index, [self.masks[i] for i in idx_list],
                list(idx_list), self.int_bits,
                self.masking_scheme == "double")
        acc_minus = jnp.zeros_like(value)  # sum of clients' add-streams
        acc_add = jnp.zeros_like(value)  # sum of clients' minus-streams
        for i in idx_list:
            loc = self.masks[i]
            cnt = int(loc.shape[0])
            a = self._s(i, cnt)
            acc_minus = _scatter_accumulate(acc_minus, a, loc, self.int_bits)
            if self.masking_scheme == "double":
                b = self._s(i + 1, cnt)
                acc_add = _scatter_accumulate(acc_add, b, loc, self.int_bits)
        out = lane_sub(value, acc_minus, self.int_bits)
        if self.masking_scheme == "double":
            out = lane_add(out, acc_add, self.int_bits)
        return out
