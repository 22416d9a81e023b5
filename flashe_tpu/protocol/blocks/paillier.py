"""Paillier session block (reference jzf_paillier_block.py).

Semi-honest shared-keypair model (jzf_paillier.py note at 69): the guest
generates (n, p, q), AES-wraps (p, q) for each host under the pairwise DH
secret, and the arbiter relays blobs while keeping only the public n —
it can multiply ciphertexts mod n^2 but never decrypt.
"""

from __future__ import annotations

import pickle

import numpy as np

from flashe_tpu.crypto.paillier import (
    PaillierCipher, PaillierPrivateKey, PaillierPublicKey,
)
from flashe_tpu.fed import consts
from flashe_tpu.ops.lanes import ints_to_lanes, lanes_to_ints
from flashe_tpu.protocol import dh_sync, uuid_sync
from flashe_tpu.protocol.blocks import _keywrap
from flashe_tpu.quant.quantizer import QuantizingArbiter, QuantizingClient

__all__ = ["Arbiter", "Guest", "Host"]


def _qargs(args):
    q = args["quantize"]
    return q["int_bits"], q["batch"], q["element_bits"], \
        q.get("padding", True), q["secure"]


class Arbiter(uuid_sync.Arbiter, dh_sync.Arbiter):
    def __init__(self, args):
        self.args = args
        (self.int_bits, self.batch, self.element_bits, _,
         self.secure) = _qargs(args)
        self.wire_int_bits = None  # ciphertexts are big ints, not lanes
        self.key_length = args.get("key_length", 2048)
        self.cipher = PaillierCipher()
        self.quantizer = None
        self._trv = None

    def register_paillier_cipher(self, t):
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
        n = self._trv.guest_to_arbiter.get(idx=0, suffix=("pubkey",))
        self.cipher.set_public_key(PaillierPublicKey(n))
        self.quantizer = QuantizingArbiter(self.int_bits, self.batch,
                                           self.element_bits, self.secure)
        self.quantizer.set_num_clients(cnt)
        _keywrap.broadcast_num_clients(self._trv, cnt)
        return self

    def set_iter_index(self, it):
        self.quantizer.set_iter(it)

    def help_quantize(self):
        return None  # secure path only

    def get_n(self):
        return self.cipher.get_n()

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
        self.key_length = args.get("key_length", 2048)
        self.cipher = PaillierCipher()
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
        """Batched quantized lanes -> object-int ciphertext vector."""
        ints = lanes_to_ints(np.asarray(q_lanes), self.int_bits)
        return self.cipher.encrypt(ints)

    def decrypt(self, cts, count=None):
        """Aggregated ciphertexts -> uint32 limb lanes of plaintext sums."""
        sums = self.cipher.decrypt(cts)
        import jax.numpy as jnp
        return jnp.asarray(ints_to_lanes(sums, self.int_bits))

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
    def register_paillier_cipher(self, t):
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
        self.cipher.generate_key(self.key_length)
        pub, prv = self.cipher.get_key_pair()
        blob = pickle.dumps((prv.p, prv.q))
        self._to_arbiter.remote(
            obj=_keywrap.guest_wrap_for_hosts(exchanged, blob),
            role=consts.ARBITER, idx=0, suffix=("seed",))
        self._to_arbiter.remote(obj=pub.n, role=consts.ARBITER, idx=0,
                                suffix=("pubkey",))
        self._finish(seed=0)
        return self


class Host(_Client):
    def register_paillier_cipher(self, t):
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
        p, q = pickle.loads(_keywrap.host_unwrap(exchanged, guest_uuid,
                                                 wrapped))
        pub = PaillierPublicKey(p * q)
        self.cipher.set_public_key(pub)
        self.cipher.set_privacy_key(PaillierPrivateKey(pub, p, q))
        self._finish(seed=1)
        return self
