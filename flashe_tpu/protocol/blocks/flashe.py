"""FLASHE session setup (reference jzf_flashe_block.py).

Flow (create_cipher, runs once per job):
1. uuid sync (conflict-checked) and DH exchange via arbiter relay; the
   arbiter-assigned ordinal becomes the mask stream index,
2. guest generates the 256-bit PRP seed, AES-CTR-wraps it per host under
   the pairwise DH secret, and relays the dict through the arbiter
   (flashe_block.py:193-244); hosts unwrap with the guest secret
   (flashe_block.py:287-326),
3. arbiter counts clients and broadcasts num_clients,
4. precompute bootstrap: set_num_params + prepare_encrypt for round 0
   (flashe_block.py:227-229).

Dynamic masking (mask='dynamic', used with sparsification): the arbiter
compares single- vs double-mask decrypt cost from the clients' location
masks and broadcasts {"choice", "masks"} (flashe_block.py:89-117).
"""

from __future__ import annotations

import numpy as np

from flashe_tpu.crypto.aes_host import AESCipher
from flashe_tpu.crypto.flashe import FlasheCipher
from flashe_tpu.fed import consts
from flashe_tpu.protocol import dh_sync, uuid_sync
from flashe_tpu.quant.quantizer import QuantizingArbiter, QuantizingClient

__all__ = ["Arbiter", "Guest", "Host"]


def _parse_args(args):
    q = args["quantize"]
    return {
        "int_bits": q["int_bits"],
        "batch": q["batch"],
        "element_bits": q["element_bits"],
        "padding": q.get("padding", True),
        "secure": q["secure"],
        "mask": args.get("mask", "double"),
        "precompute": args.get("precompute", {"enable": False}),
        # >1 (or "all"): the party shards encrypt/decrypt over that many
        # local devices (parallel/party.LocalLaneMesh)
        "local_lane_shards": args.get("local_lane_shards"),
    }


class Arbiter(uuid_sync.Arbiter, dh_sync.Arbiter):
    def __init__(self, args):
        a = _parse_args(args)
        self.int_bits = a["int_bits"]
        self.wire_int_bits = a["int_bits"]
        self.batch = a["batch"]
        self.element_bits = a["element_bits"]
        self.secure = a["secure"]
        self.mask = a["mask"]
        self.quantizer = None
        self._trv = None
        self._layer_sizes_known = False

    def register_flashe_cipher(self, transfer_variables):
        t = transfer_variables
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

        # forward guest's wrapped seeds to hosts by comm idx
        sharing_dict = self._trv.guest_to_arbiter.get(idx=0, suffix=("seed",))
        client_cnt = 1  # guest
        for comm_idx, wrapped in sharing_dict.items():
            client_cnt += 1
            self._trv.arbiter_to_host.remote(obj=wrapped, role=consts.HOST,
                                             idx=comm_idx, suffix=("seed",))

        self.quantizer = QuantizingArbiter(self.int_bits, self.batch,
                                           self.element_bits, self.secure)
        self.quantizer.set_num_clients(client_cnt)
        self._trv.arbiter_to_guest.remote(obj=client_cnt, role=consts.GUEST,
                                          idx=0, suffix=("num_clients",))
        self._trv.arbiter_to_host.remote(obj=client_cnt, role=consts.HOST,
                                         idx=-1, suffix=("num_clients",))
        return self

    def set_iter_index(self, iter_index):
        self.quantizer.set_iter(iter_index)

    def help_quantize(self):
        """Non-secure arbiter-assisted clipping (jzf_quantize.py:308-333)."""
        if self.secure:
            return
        it = self.quantizer.iter
        if not self._layer_sizes_known:
            sizes = self._trv.guest_to_arbiter.get(idx=0, suffix=(it, -1))
            self.quantizer.set_layer_sizes(sizes)
            self._layer_sizes_known = True
        guest_mm = self._trv.guest_to_arbiter.get(idx=0, suffix=(it, 0))
        host_mms = self._trv.host_to_arbiter.get(idx=-1, suffix=(it, 0))
        mins = [guest_mm[0]] + [m[0] for m in host_mms]
        maxs = [guest_mm[1]] + [m[1] for m in host_mms]
        alphas = self.quantizer.help_quantize(mins, maxs)
        self._trv.arbiter_to_guest.remote(obj=alphas, role=consts.GUEST,
                                          idx=0, suffix=(it, 0))
        self._trv.arbiter_to_host.remote(obj=alphas, role=consts.HOST,
                                         idx=-1, suffix=(it, 0))

    def dynamic_masking(self, masks, total, suffix):
        """Single-vs-double cost decision from location masks
        (flashe_block.py:89-117)."""
        if self.mask != "dynamic":
            return
        single_cost = 2 * sum(len(m) for m in masks)
        double_cost = 2 * single_cost
        one_hots = []
        for m in masks:
            oh = np.zeros(total, np.int64)
            oh[np.asarray(m)] = 1
            one_hots.append(oh)
        cancelled = 0
        for i in range(len(masks) - 1):
            cancelled += int(np.sum(one_hots[i] & one_hots[i + 1]))
        double_cost -= 2 * cancelled
        choice = "single" if single_cost <= double_cost else "double"
        d = {"choice": choice, "masks": masks}
        self._trv.arbiter_to_guest.remote(obj=d, role=consts.GUEST, idx=0,
                                          suffix=suffix + ("choice",))
        self._trv.arbiter_to_host.remote(obj=d, role=consts.HOST, idx=-1,
                                         suffix=suffix + ("choice",))


class _Client(uuid_sync.Client, dh_sync.Client):
    def __init__(self, args):
        a = _parse_args(args)
        self.int_bits = a["int_bits"]
        self.wire_int_bits = a["int_bits"]
        self.batch = a["batch"]
        self.element_bits = a["element_bits"]
        self.padding = a["padding"]
        self.secure = a["secure"]
        self.mask = a["mask"]
        self.precompute = a["precompute"].get("enable", False)
        self.num_params = a["precompute"].get("num_params")
        self.local_lane_shards = a["local_lane_shards"]
        self.cipher: FlasheCipher | None = None
        self.quantizer: QuantizingClient | None = None
        self._to_arbiter = None
        self._from_arbiter = None
        self._sent_layer_sizes = False

    # thin passthroughs used by the aggregator
    def encrypt(self, value):
        return self.cipher.encrypt(value)

    def decrypt(self, value, idx_list=None):
        return self.cipher.decrypt(value, idx_list)

    def get_idx_list(self):
        return self.cipher.get_idx_list()

    def set_iter_index(self, iter_index):
        self.cipher.set_iter_index(iter_index)
        self.quantizer.set_iter(iter_index)

    def set_codec(self, codec):
        self.quantizer.set_codec(codec)
        if self.precompute and self.cipher.num_params is None:
            # precompute.num_params omitted in the conf: default to the
            # model's lane count (the reference requires it explicitly,
            # e.g. cnn_* confs pin 1206590; the codec knows it here)
            self.cipher.set_num_params(codec.total)

    def quantize(self, flat):
        if not self.secure:
            it = self.quantizer.iter
            if not self._sent_layer_sizes:
                self._to_arbiter.remote(obj=self.quantizer.codec.sizes,
                                        role=consts.ARBITER, idx=0,
                                        suffix=(it, -1))
                self._sent_layer_sizes = True
            mm = self.quantizer.local_min_max(flat)
            self._to_arbiter.remote(obj=mm, role=consts.ARBITER, idx=0,
                                    suffix=(it, 0))
            alphas = self._from_arbiter.get(idx=0, suffix=(it, 0))
            return self.quantizer.quantize(flat, alpha_override=alphas)
        return self.quantizer.quantize(flat)

    def unquantize(self, q, n_elements=None, n_clients=None):
        return self.quantizer.unquantize(q, n_elements, n_clients)

    def normalize(self, flat):
        return self.quantizer.normalize(flat)

    def unnormalize(self, flat):
        return self.quantizer.unnormalize(flat)

    def prepare_encrypt(self):
        if self.precompute:
            self.cipher.prepare_encrypt()

    def prepare_decrypt(self):
        if self.precompute:
            self.cipher.prepare_decrypt()

    def dynamic_masking(self, suffix):
        if self.mask != "dynamic":
            return
        d = self._from_arbiter.get(idx=0, suffix=suffix + ("choice",))
        self.cipher.masking_scheme = d["choice"]
        self.cipher.set_masks(d["masks"], self.cipher.total)

    def _finish_setup(self):
        self.quantizer = QuantizingClient(
            self.int_bits, self.batch, self.element_bits, self.padding,
            self.secure, seed=self.cipher.idx)
        num_clients = self._from_arbiter.get(idx=0, suffix=("num_clients",))
        self.quantizer.set_num_clients(num_clients)
        self.cipher.set_num_clients(num_clients)
        if self.local_lane_shards is not None:
            self.cipher.set_local_devices(self.local_lane_shards)
        if self.precompute and self.num_params is not None:
            self.cipher.set_num_params(self.num_params)
            self.cipher.prepare_encrypt()  # round-0 bootstrap (offline)


class Guest(_Client):
    def register_flashe_cipher(self, transfer_variables):
        t = transfer_variables
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
        exchanged_keys = self.key_exchange(uuid)

        cipher = FlasheCipher(self.int_bits, mask=(
            "double" if self.mask == "dynamic" else self.mask))
        cipher.set_self_uuid(uuid)
        cipher.set_exchanged_keys(exchanged_keys)
        cipher.generate_prp_seed()
        seed = cipher.get_prp_seed()

        # wrap the seed for each host under the pairwise DH secret
        sharing_dict = {}
        for _, tup in exchanged_keys.items():
            if tup[2] == "guest":
                continue
            aes = AESCipher()
            aes.generate_key(256, assigned_key=tup[1], mode="CTR")
            sharing_dict[tup[3]] = aes.encrypt(seed)
        self._to_arbiter.remote(obj=sharing_dict, role=consts.ARBITER,
                                idx=0, suffix=("seed",))
        self.cipher = cipher
        self._finish_setup()
        return self


class Host(_Client):
    def register_flashe_cipher(self, transfer_variables):
        t = transfer_variables
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
        exchanged_keys = self.key_exchange(uuid)

        cipher = FlasheCipher(self.int_bits, mask=(
            "double" if self.mask == "dynamic" else self.mask))
        cipher.set_self_uuid(uuid)
        cipher.set_exchanged_keys(exchanged_keys)

        wrapped = self._from_arbiter.get(idx=0, suffix=("seed",))
        secret = exchanged_keys[cipher.get_guest_uuid()][1]
        aes = AESCipher()
        aes.generate_key(256, assigned_key=secret, mode="CTR")
        seed = aes.decrypt(wrapped)
        cipher.generate_prp_seed(assigned_seed=seed)

        self.cipher = cipher
        self._finish_setup()
        return self
