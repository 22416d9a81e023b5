"""BFV session block (reference jzf_bfv_block.py:58-95).

Guest creates the context + keys; the secret polynomial travels to hosts
AES-wrapped under DH secrets; the arbiter keeps only the ring parameters
(enough to add ciphertexts, never to decrypt).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from flashe_tpu.crypto.bfv import BFVCipher
from flashe_tpu.fed import consts
from flashe_tpu.protocol import dh_sync, uuid_sync
from flashe_tpu.protocol.blocks import _keywrap
from flashe_tpu.quant.quantizer import QuantizingArbiter, QuantizingClient

__all__ = ["Arbiter", "Guest", "Host"]


def _params(args):
    return (args.get("p", 1964769281), args.get("m", 8192),
            args.get("sec", 128), args.get("flagBatching", True))


def _qargs(args):
    q = args["quantize"]
    return q["int_bits"], q["batch"], q["element_bits"], \
        q.get("padding", True), q["secure"]


class Arbiter(uuid_sync.Arbiter, dh_sync.Arbiter):
    def __init__(self, args):
        self.args = args
        (self.int_bits, self.batch, self.element_bits, _,
         self.secure) = _qargs(args)
        self.wire_int_bits = None
        p, m, sec, batching = _params(args)
        self.cipher = BFVCipher(p, m, sec, batching)  # context only, no keys
        self.quantizer = None
        self._trv = None

    def register_bfv_cipher(self, t):
        self._trv = t
        self.register_identify_uuid(guest_uuid_trv=t.guest_uuid,
                                    host_uuid_trv=t.host_uuid,
                                    conflict_flag_trv=t.uuid_conflict_flag)
        self.register_dh_key_exchange(
            dh_pubkey_trv=t.dh_pubkey,
            dh_ciphertext_host_trv=t.dh_ciphertext_host,
            dh_ciphertext_guest_trv=t.dh_ciphertext_guest,
            dh_ciphertext_bc_trv=t.dh_ciphertext_bc)
        return self

    def create_cipher(self):
        self.validate_uuid()
        self.key_exchange()
        cnt = _keywrap.arbiter_relay(self._trv)
        # forward the guest's public key to hosts (it is public material)
        pk = self._trv.guest_to_arbiter.get(idx=0, suffix=("pubkey",))
        self._trv.arbiter_to_host.remote(obj=pk, role=consts.HOST, idx=-1,
                                         suffix=("pubkey",))
        self.quantizer = QuantizingArbiter(self.int_bits, self.batch,
                                           self.element_bits, self.secure)
        self.quantizer.set_num_clients(cnt)
        _keywrap.broadcast_num_clients(self._trv, cnt)
        return self

    def set_iter_index(self, it):
        self.quantizer.set_iter(it)

    def help_quantize(self):
        return None

    def add_ciphertexts(self, ct_arrays):
        return self.cipher.add_ciphertexts(ct_arrays)

    def dynamic_masking(self, masks, total, suffix):
        return None


class _Client(uuid_sync.Client, dh_sync.Client):
    def __init__(self, args):
        self.args = args
        (self.int_bits, self.batch, self.element_bits, self.padding,
         self.secure) = _qargs(args)
        self.wire_int_bits = None
        p, m, sec, batching = _params(args)
        self._bfv_params = (p, m, sec, batching)
        self.cipher = None
        self.quantizer = None
        self._to_arbiter = None
        self._from_arbiter = None

    def set_codec(self, codec):
        self.quantizer.set_codec(codec)

    def set_iter_index(self, it):
        self.quantizer.set_iter(it)

    def quantize(self, flat):
        return self.quantizer.quantize(flat)

    def unquantize(self, q_lanes, n_elements=None, n_clients=None):
        return self.quantizer.unquantize(q_lanes, n_elements, n_clients)

    def normalize(self, flat):
        return self.quantizer.normalize(flat)

    def unnormalize(self, flat):
        return self.quantizer.unnormalize(flat)

    def encrypt(self, q_lanes):
        return self.cipher.encrypt(np.asarray(q_lanes))

    def decrypt(self, cts, count=None):
        # cipher.decrypt consumes device arrays directly (wire arrivals
        # are numpy; in-process payloads stay on device)
        return jnp.asarray(self.cipher.decrypt(cts, count))

    def prepare_encrypt(self):
        pass

    def prepare_decrypt(self):
        pass

    def dynamic_masking(self, suffix):
        pass

    def get_idx_list(self):
        return None

    def _finish(self, seed):
        self.quantizer = QuantizingClient(self.int_bits, self.batch,
                                          self.element_bits, self.padding,
                                          self.secure, seed=seed)
        n = _keywrap.receive_num_clients(self._from_arbiter)
        self.quantizer.set_num_clients(n)


class Guest(_Client):
    def register_bfv_cipher(self, t):
        self._to_arbiter = t.guest_to_arbiter
        self._from_arbiter = t.arbiter_to_guest
        self.register_identify_uuid(
            uuid_transfer_variable=t.guest_uuid,
            conflict_flag_transfer_variable=t.uuid_conflict_flag)
        self.register_dh_key_exchange(
            dh_pubkey_trv=t.dh_pubkey,
            dh_ciphertext_trv=t.dh_ciphertext_guest,
            dh_ciphertext_bc_trv=t.dh_ciphertext_bc)
        return self

    def create_cipher(self):
        uuid = self.generate_uuid()
        exchanged = self.key_exchange(uuid)
        p, m, sec, batching = self._bfv_params
        self.cipher = BFVCipher(p, m, sec, batching, seed=None).generate_keys()
        self._to_arbiter.remote(
            obj=_keywrap.guest_wrap_for_hosts(
                exchanged, self.cipher.serialize_secret()),
            role=consts.ARBITER, idx=0, suffix=("seed",))
        self._to_arbiter.remote(obj=self.cipher.public_parts(),
                                role=consts.ARBITER, idx=0,
                                suffix=("pubkey",))
        # the arbiter forwards the public key to hosts
        self._finish(seed=0)
        return self


class Host(_Client):
    def register_bfv_cipher(self, t):
        self._to_arbiter = t.host_to_arbiter
        self._from_arbiter = t.arbiter_to_host
        self.register_identify_uuid(
            uuid_transfer_variable=t.host_uuid,
            conflict_flag_transfer_variable=t.uuid_conflict_flag)
        self.register_dh_key_exchange(
            dh_pubkey_trv=t.dh_pubkey,
            dh_ciphertext_trv=t.dh_ciphertext_host,
            dh_ciphertext_bc_trv=t.dh_ciphertext_bc)
        return self

    def create_cipher(self):
        uuid = self.generate_uuid()
        exchanged = self.key_exchange(uuid)
        guest_uuid = next(u for u, tup in exchanged.items()
                          if tup[2] == "guest")
        wrapped = self._from_arbiter.get(idx=0, suffix=("seed",))
        p, m, sec, batching = self._bfv_params
        self.cipher = BFVCipher(p, m, sec, batching, seed=None)
        self.cipher.load_secret(
            _keywrap.host_unwrap(exchanged, guest_uuid, wrapped))
        pk = self._from_arbiter.get(idx=0, suffix=("pubkey",))
        self.cipher.set_public_parts(pk)
        self._finish(seed=1)
        return self
