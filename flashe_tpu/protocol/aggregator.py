"""The secure-aggregation engine (reference jzf_aggregator.py re-designed
for flat lane vectors).

Client round (jzf_aggregator.py:673-828):
  degree-scale -> [sparsify + location upload + dynamic-mask hint] ->
  normalize -> quantize -> encrypt -> upload handshake ->
  (prepare_decrypt / prepare_encrypt overlap) -> download -> decrypt ->
  unquantize -> degree-divide -> unnormalize -> [+ last round's weights]

Arbiter round (jzf_aggregator.py:220-544):
  [collect masks + dynamic masking decision] -> flow-controlled collect ->
  scheme reduce (flashe: lane-wise mod-2^m add; plain: exact add) ->
  [expand sparse uploads to dense with the quantized-zero filler] ->
  dispatch with per-party ACKs.

Flow-control modes mirror the reference: mode='parallel' collects everyone
concurrently (with optional per-partition barriers when num_partitions>1,
needed for Paillier's ciphertext inflation); mode='serial' polls one client
at a time with allow_upload grants.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from flashe_tpu.fed import consts
from flashe_tpu.ops.lanes import lane_add
from flashe_tpu.protocol import loss_sync
from flashe_tpu.protocol.blocks import flashe as flashe_block
from flashe_tpu.protocol.blocks import plain as plain_block
from flashe_tpu.protocol.payload import (
    ModelPayload, merge_lane_parts, partition_lanes,
)
from flashe_tpu.protocol.sparsify import (
    Sparsifier, decode_locations, encode_locations,
)
from flashe_tpu.runtime.tracking import phase

__all__ = ["Arbiter", "Client", "Guest", "Host", "with_role", "LossPayload",
           "is_dropped_marker"]

_DROPPED_KEY = "__flashe_dropped__"


def _dropped_marker(iter_index, payload=None) -> dict:
    """Control frame sent to a host that missed the upload deadline.

    The reference drops a party by silence (the arbiter simply re-requests
    or stalls, jzf_aggregator.py:314-361); here the arbiter answers every
    channel the slow host blocks on, so a slow-but-alive host unblocks
    immediately and rejoins at round r+1 (the arbiter re-collects from all
    registered hosts every round).

    The frame carries the aggregated payload when available: FLASHE
    decryption needs only the survivor idx-list, so a dropped host can
    still install the survivors' global model.  That is not a courtesy —
    it is required for rejoining: the secure quantizer derives each
    round's clip threshold from running statistics of the previous global
    model (jzf_quantize.py:394-424), and a host that skipped a global
    update would quantize its next upload on a different alpha scale,
    corrupting the aggregate for every participant."""
    return {_DROPPED_KEY: int(iter_index), "payload": payload}


def is_dropped_marker(obj) -> bool:
    return isinstance(obj, dict) and _DROPPED_KEY in obj


class LossPayload:
    """NumericWeights stand-in for the loss channel (jzf_weights.py:372-394)."""

    def __init__(self, value: float, degree: Optional[float] = None):
        self.unboxed = float(value)
        self._degree = degree

    def get_degree(self, default=None):
        return self._degree if self._degree is not None else default


def _make_block(role, secure_aggregate, args, transfer_variables):
    if secure_aggregate == "flashe":
        mod, reg, create = flashe_block, "register_flashe_cipher", "create_cipher"
    elif secure_aggregate == "plain":
        mod, reg, create = plain_block, "register_plain_cipher", "create_quantizer"
    elif secure_aggregate == "paillier":
        from flashe_tpu.protocol.blocks import paillier as mod
        reg, create = "register_paillier_cipher", "create_cipher"
    elif secure_aggregate == "bfv":
        from flashe_tpu.protocol.blocks import bfv as mod
        reg, create = "register_bfv_cipher", "create_cipher"
    elif secure_aggregate == "ckks":
        from flashe_tpu.protocol.blocks import ckks as mod
        reg, create = "register_ckks_cipher", "create_cipher"
    elif secure_aggregate == "additive":
        from flashe_tpu.protocol.blocks import additive as mod
        reg, create = "register_additive_mask_cipher", "create_cipher"
    else:
        raise ValueError(f"unknown secure_aggregate scheme {secure_aggregate}")
    cls = {"guest": mod.Guest, "host": mod.Host, "arbiter": mod.Arbiter}[role]
    block = cls(args)
    getattr(block, reg)(transfer_variables)
    return getattr(block, create)()


class Arbiter:
    def __init__(self):
        self.model = None
        self.sparsity = 1.0
        self.secure_aggregate = None
        self.secure_aggregate_args = None
        self._block = None
        self._loss_sync = None
        self._converge_sync = None
        self._trv = None
        self.num_hosts = None
        self.dropped_hosts = []

    def register_aggregator(self, transfer_variables, sparsity=1.0,
                            secure_aggregate="plain",
                            secure_aggregate_args=None):
        self.sparsity = sparsity
        self.secure_aggregate = secure_aggregate
        self.secure_aggregate_args = secure_aggregate_args or {
            "mode": "parallel", "num_partitions": 1}
        self._trv = transfer_variables
        self.num_hosts = len(
            transfer_variables.federation.roles_to_parties([consts.HOST]))
        self._block = _make_block("arbiter", secure_aggregate,
                                 secure_aggregate_args, transfer_variables)
        self._loss_sync = loss_sync.LossArbiter().register_loss_transfer(
            host_loss_transfer=transfer_variables.host_loss,
            guest_loss_transfer=transfer_variables.guest_loss)
        self._converge_sync = loss_sync.ConvergeArbiter().register_is_converge(
            is_converge_variable=transfer_variables.is_converge)
        return self

    # -- collection --------------------------------------------------------

    def _collect(self, suffix):
        """Flow-controlled upload collection (jzf_aggregator.py:248-361)."""
        t = self._trv
        mode = self.secure_aggregate_args.get("mode", "parallel")
        nparts = self.secure_aggregate_args.get("num_partitions", 1)
        payloads = []
        self.dropped_hosts = []

        if mode == "parallel" and nparts > 1:
            # per-partition barrier with per-host deadlines: a host that
            # misses its slot for any partition is dropped for the round
            # (its earlier parts are discarded) and notified on the
            # upload_result channel it blocks on next
            timeout = self.secure_aggregate_args.get("upload_timeout_s")
            guest_parts = []
            host_parts = {h: [] for h in range(self.num_hosts)}
            for p in range(nparts):
                t.arbiter_to_guest.remote(obj="allow_upload", role=consts.GUEST,
                                          idx=0, suffix=suffix + ("allow_upload", p))
                for h in range(self.num_hosts):
                    if h in self.dropped_hosts:
                        continue
                    t.arbiter_to_host.remote(
                        obj="allow_upload", role=consts.HOST, idx=h,
                        suffix=suffix + ("allow_upload", p))
                guest_parts.append(
                    t.guest_to_arbiter.get(idx=0, suffix=suffix + ("upload_model", p)))
                for h in range(self.num_hosts):
                    if h in self.dropped_hosts:
                        continue
                    try:
                        host_parts[h].append(t.host_to_arbiter.get(
                            idx=h, suffix=suffix + ("upload_model", p),
                            timeout=timeout if timeout else 600.0))
                    except TimeoutError:
                        if not timeout:
                            raise
                        self.dropped_hosts.append(h)
                        host_parts.pop(h)
                        t.arbiter_to_host.remote(
                            obj=_dropped_marker(p), role=consts.HOST, idx=h,
                            suffix=suffix + ("upload_result", p))
                t.arbiter_to_guest.remote(obj="finish", role=consts.GUEST,
                                          idx=0, suffix=suffix + ("upload_result", p))
                for h in range(self.num_hosts):
                    if h in self.dropped_hosts:
                        continue
                    t.arbiter_to_host.remote(
                        obj="finish", role=consts.HOST, idx=h,
                        suffix=suffix + ("upload_result", p))
            payloads = [merge_lane_parts(guest_parts)] + [
                merge_lane_parts(host_parts[h])
                for h in range(self.num_hosts) if h not in self.dropped_hosts]
        elif mode == "parallel":
            # optional dropout tolerance: a host that misses the upload
            # deadline is dropped from this round; FLASHE's double masking
            # keeps the survivors' aggregate decryptable via the run-merged
            # idx list (README claim #3; jzf_flashe.py:354-386)
            timeout = self.secure_aggregate_args.get("upload_timeout_s")
            payloads.append(
                t.guest_to_arbiter.get(idx=0, suffix=suffix + ("upload_model", 0)))
            for h in range(self.num_hosts):
                try:
                    payloads.append(t.host_to_arbiter.get(
                        idx=h, suffix=suffix + ("upload_model", 0),
                        timeout=timeout if timeout else 600.0))
                except TimeoutError:
                    if not timeout:
                        raise
                    self.dropped_hosts.append(h)
        else:  # serial: one party at a time
            t.arbiter_to_guest.remote(obj="allow_upload", role=consts.GUEST,
                                      idx=0, suffix=suffix + ("allow_upload",))
            payloads.append(
                t.guest_to_arbiter.get(idx=0, suffix=suffix + ("upload_model", 0)))
            t.arbiter_to_guest.remote(obj="finish", role=consts.GUEST,
                                      idx=0, suffix=suffix + ("upload_result", 0))
            for h in range(self.num_hosts):
                t.arbiter_to_host.remote(obj="allow_upload", role=consts.HOST,
                                         idx=h, suffix=suffix + ("allow_upload",))
                payloads.append(
                    t.host_to_arbiter.get(idx=h, suffix=suffix + ("upload_model", 0)))
                t.arbiter_to_host.remote(obj="finish", role=consts.HOST,
                                         idx=h, suffix=suffix + ("upload_result", 0))
        return [p.unpack() for p in payloads]

    # -- reduction ---------------------------------------------------------

    def _reduce(self, payloads, masks=None, total=None):
        """Scheme-specific ciphertext reduce (jzf_aggregator.py:386-450)."""
        scheme = self.secure_aggregate
        if masks is not None:
            # expand sparse uploads to dense with the quantized-zero filler
            # (jzf_aggregator.py:150-165)
            dense = []
            for pl, loc in zip(payloads, masks):
                lanes = np.asarray(pl.lanes)
                zero, lanes = lanes[-1], lanes[:-1]
                d = np.full(total, zero, lanes.dtype)
                d[loc] = lanes
                dense.append(d)
            arrays = dense
        else:
            # in-process federation delivers device arrays: keep them on
            # device (at 100M params a host round-trip per client per
            # round is 4 GB of needless PCIe/tunnel traffic); TCP
            # arrivals are numpy already
            arrays = [p.lanes if isinstance(p.lanes, jax.Array)
                      else np.asarray(p.lanes) for p in payloads]

        if scheme in ("paillier", "bfv", "ckks"):
            # the ciphers' add_ciphertexts dedups uploads and keeps the
            # chain device-resident; don't force a host round-trip here
            return self._block.add_ciphertexts(list(arrays))

        arrays = [jnp.asarray(a) for a in arrays]
        if scheme == "flashe" or (
            scheme == "plain" and payloads[0].int_bits is not None
        ):
            int_bits = self._block.int_bits
            acc = arrays[0]
            for a in arrays[1:]:
                acc = lane_add(acc, a, int_bits)
        else:  # plain float
            acc = functools.reduce(lambda x, y: x + y, arrays)
        return acc

    def aggregate_model(self, iter_index, suffix=tuple()):
        self._block.set_iter_index(iter_index)
        self._block.help_quantize()

        masks = None
        total = None
        if self.sparsity != 1.0:
            t = self._trv
            host_objs = t.host_to_arbiter.get(idx=-1, suffix=suffix + ("mask",))
            guest_obj = t.guest_to_arbiter.get(idx=0, suffix=suffix + ("mask",))
            masks = [decode_locations(guest_obj)] + [
                decode_locations(o) for o in host_objs]
            total = guest_obj["total"]
            self._block.dynamic_masking(masks, total, suffix)

        with phase("collect"):
            payloads = self._collect(suffix)
        degrees = [p.degree for p in payloads]
        idx_lists = [p.idx_list for p in payloads]
        total_degree = float(np.sum([d for d in degrees if d is not None]))

        with phase("aggregate"):
            acc = self._reduce(payloads, masks, total)

        if self.secure_aggregate in ("flashe",):
            total_idx_list = functools.reduce(
                lambda x, y: x + y, [il for il in idx_lists if il])
        else:
            total_idx_list = None

        out = ModelPayload(
            lanes=acc,
            n_elements=total if masks is not None else payloads[0].n_elements,
            int_bits=payloads[0].int_bits,
            degree=total_degree,
            idx_list=total_idx_list,
        )
        return out, total_degree, total_idx_list

    def aggregate_and_broadcast(self, iter_index, suffix=tuple()):
        model, total_degree, total_idx_list = self.aggregate_model(
            iter_index=iter_index, suffix=suffix)
        t = self._trv
        mode = self.secure_aggregate_args.get("mode", "parallel")
        nparts = self.secure_aggregate_args.get("num_partitions", 1)

        dropped = getattr(self, "dropped_hosts", [])
        with phase("dispatch"):
            if mode == "parallel" and nparts > 1:
                parts = partition_lanes(model, nparts)
                for p, part in enumerate(parts):
                    part.degree = total_degree
                    part.idx_list = total_idx_list
                    part.n_elements = model.n_elements
                    t.arbiter_to_guest.remote(part, role=consts.GUEST, idx=0,
                                              suffix=suffix + ("agg_model", p))
                    for h in range(self.num_hosts):
                        # dropped hosts get the same parts, wrapped in the
                        # dropped frame; their ACKs are not awaited (they
                        # may be dead, and a live one needs no flow
                        # control for a model it only reads)
                        t.arbiter_to_host.remote(
                            part if h not in dropped
                            else _dropped_marker(iter_index, part),
                            role=consts.HOST, idx=h,
                            suffix=suffix + ("agg_model", p))
                    t.guest_to_arbiter.get(idx=0, suffix=suffix + ("dispatch_result", p))
                    for h in range(self.num_hosts):
                        if h in dropped:
                            continue
                        t.host_to_arbiter.get(
                            idx=h, suffix=suffix + ("dispatch_result", p))
            else:
                t.arbiter_to_guest.remote(model, role=consts.GUEST, idx=0,
                                          suffix=suffix + ("agg_model", 0))
                t.guest_to_arbiter.get(idx=0, suffix=suffix + ("dispatch_result", 0))
                for h in range(self.num_hosts):
                    t.arbiter_to_host.remote(
                        model if h not in dropped
                        else _dropped_marker(iter_index, model),
                        role=consts.HOST, idx=h,
                        suffix=suffix + ("agg_model", 0))
                    if h in dropped:
                        continue
                    t.host_to_arbiter.get(
                        idx=h, suffix=suffix + ("dispatch_result", 0))
        return model

    def aggregate_loss(self, idx=None, suffix=tuple()):
        if idx is None and getattr(self, "dropped_hosts", None):
            idx = [h for h in range(self.num_hosts)
                   if h not in self.dropped_hosts]
        losses = self._loss_sync.get_losses(idx=idx, suffix=suffix)
        total_loss, total_degree = 0.0, 0.0
        for loss in losses:
            total_loss += loss.unboxed
            total_degree += loss.get_degree(1.0)
        return total_loss / total_degree

    def send_converge_status(self, converge_func, converge_args,
                             suffix=tuple()):
        return self._converge_sync.check_converge_status(
            converge_func=converge_func, converge_args=converge_args,
            suffix=suffix)


class Client:
    def __init__(self):
        self._block = None
        self._loss_sync = None
        self._converge_sync = None
        self._sparsity = 1.0
        self._sparsifier: Optional[Sparsifier] = None
        self._secure_aggregate = "plain"
        self._secure_aggregate_args = None
        self.codec = None
        self.degree = None
        self.weights_last_round = None
        self.to_arbiter = None
        self.from_arbiter = None
        # set by get_aggregated_model: True when the arbiter dropped this
        # client's upload for the round (the model it returns is still the
        # valid survivors' aggregate; only loss reporting is skipped)
        self.was_dropped = False

    # role subclasses set: _register(trv) wiring + _loss/_converge syncs

    def set_codec(self, codec):
        self.codec = codec
        self._block.set_codec(codec)
        if self._sparsity != 1.0:
            self._sparsifier = Sparsifier(codec, self._sparsity)

    # -- upload ------------------------------------------------------------

    def _upload(self, payload: ModelPayload, suffix):
        t_to, t_from = self.to_arbiter, self.from_arbiter
        mode = self._secure_aggregate_args.get("mode", "parallel")
        nparts = self._secure_aggregate_args.get("num_partitions", 1)
        wire_pack = self._secure_aggregate_args.get("wire_pack", False)

        def maybe_pack(p):
            return p.pack() if wire_pack else p

        with phase("upload"):
            if mode == "parallel" and nparts > 1:
                parts = partition_lanes(payload, nparts)
                for p, part in enumerate(parts):
                    if is_dropped_marker(
                        t_from.get(idx=0, suffix=suffix + ("allow_upload", p))
                    ):
                        return False
                    t_to.remote(obj=maybe_pack(part), role=consts.ARBITER,
                                idx=0, suffix=suffix + ("upload_model", p))
                    if is_dropped_marker(
                        t_from.get(idx=0, suffix=suffix + ("upload_result", p))
                    ):
                        return False
            elif mode == "parallel":
                t_to.remote(obj=maybe_pack(payload), role=consts.ARBITER,
                            idx=0, suffix=suffix + ("upload_model", 0))
            else:
                t_from.get(idx=0, suffix=suffix + ("allow_upload",))
                t_to.remote(obj=maybe_pack(payload), role=consts.ARBITER,
                            idx=0, suffix=suffix + ("upload_model", 0))
                t_from.get(idx=0, suffix=suffix + ("upload_result", 0))
        return True

    def secure_aggregate(self, flat, before=None, iter_index=0,
                         suffix=tuple(), degree=None):
        """Model upload path (jzf_aggregator.py:673-807)."""
        scheme = self._secure_aggregate
        if degree:
            flat = flat * degree
            self.degree = degree
        else:
            self.degree = 1.0

        self._block.set_iter_index(iter_index)

        locations = None
        if self._sparsity != 1.0:
            self.weights_last_round = before
            delta = flat - before
            res = self._sparsifier.sparsify(np.asarray(delta))
            locations = res.locations
            if scheme == "flashe":
                self._block.cipher.total = res.total
            self.to_arbiter.remote(
                obj=encode_locations(locations, res.total),
                role=consts.ARBITER, idx=0, suffix=suffix + ("mask",))
            self._block.dynamic_masking(suffix)

            values = self._block.quantizer.normalize_gather(
                jnp.asarray(res.values), locations)
            with phase("encoding"):
                q = self._block.quantizer.quantize_gather(values, locations)
            n_elements = len(locations)
        else:
            flat = self._block.normalize(flat)
            with phase("encoding"):
                q = self._block.quantize(flat)
            n_elements = self.codec.total

        if scheme in ("flashe", "paillier", "bfv", "ckks", "additive"):
            with phase("encryption"):
                enc = self._block.encrypt(q)
        else:
            enc = q

        if locations is not None:
            # append the quantized zero used as the dense filler (the
            # reference's 'zzz' trick, jzf_aggregator.py:716-743).  For
            # flashe/plain the filler travels in plaintext (the reference
            # excludes the zero from flashe encryption,
            # jzf_aggregator.py:736-743); for paillier it is a ciphertext
            # (the 'zzz' layer passes through weights.encrypted there).
            qz = self._block.quantizer.quantized_zero()
            if scheme == "paillier":
                enc = np.concatenate(
                    [enc, self._block.encrypt(np.asarray([qz], np.uint32))])
            else:
                enc = jnp.concatenate(
                    [enc, jnp.asarray([qz], dtype=enc.dtype)])

        int_bits = getattr(self._block, "wire_int_bits",
                           getattr(self._block, "int_bits", None))
        payload = ModelPayload(
            lanes=enc, n_elements=n_elements, int_bits=int_bits,
            degree=self.degree, idx_list=self._block.get_idx_list())
        return self._upload(payload, suffix)

    def send_model(self, flat, before, iter_index, degree=None,
                   suffix=tuple()):
        return self.secure_aggregate(flat, before=before,
                                     iter_index=iter_index, suffix=suffix,
                                     degree=degree)

    def aggregate_then_get(self, flat, iter_index, before=None, degree=None,
                           suffix=tuple()):
        """One round: upload, overlap mask precompute, download.

        Returns the new global flat vector, or None if the arbiter dropped
        this client for the round (missed upload deadline) — the caller
        keeps its local weights and rejoins at the next iteration."""
        self.send_model(flat=flat, before=before, iter_index=iter_index,
                        degree=degree, suffix=suffix)
        # note: even a host dropped mid-upload (partitioned mode) proceeds
        # to the download — the arbiter ships it the aggregate wrapped in
        # dropped frames so it can install the global model and keep its
        # quantizer statistics synchronized (see _dropped_marker)
        if self._secure_aggregate == "flashe":
            # overlap mask generation with the arbiter's aggregation window
            # (jzf_aggregator.py:820-826); JAX dispatch is async so these
            # return immediately and compute in the background
            with phase("prepare_decrypt"):
                self._block.prepare_decrypt()
            with phase("prepare_encrypt"):
                self._block.prepare_encrypt()
        return self.get_aggregated_model(suffix=suffix)

    def _discard_prepared_decrypt(self, iter_index=None):
        """Drop this round's precomputed decrypt masks after being dropped
        (they are keyed by iteration and would otherwise linger)."""
        cipher = getattr(self._block, "cipher", None)
        prepared = getattr(cipher, "_prepared", None)
        if prepared is not None:
            if iter_index is None:
                iter_index = cipher.iter_index
            prepared.pop(("dec", iter_index), None)

    # -- download ----------------------------------------------------------

    def get_aggregated_model(self, suffix=tuple()):
        t_to, t_from = self.to_arbiter, self.from_arbiter
        mode = self._secure_aggregate_args.get("mode", "parallel")
        nparts = self._secure_aggregate_args.get("num_partitions", 1)

        self.was_dropped = False
        with phase("download"):
            if mode == "parallel" and nparts > 1:
                parts = []
                for p in range(nparts):
                    part = t_from.get(idx=0, suffix=suffix + ("agg_model", p))
                    if is_dropped_marker(part):
                        self.was_dropped = True
                        part = part["payload"]
                        if part is None:
                            self._discard_prepared_decrypt()
                            return None
                    else:
                        t_to.remote(obj="finish", role=consts.ARBITER, idx=0,
                                    suffix=suffix + ("dispatch_result", p))
                    parts.append(part)
                payload = merge_lane_parts(parts)
            else:
                payload = t_from.get(idx=0, suffix=suffix + ("agg_model", 0))
                if is_dropped_marker(payload):
                    self.was_dropped = True
                    payload = payload["payload"]
                    if payload is None:
                        self._discard_prepared_decrypt()
                        return None
                else:
                    t_to.remote(obj="finish", role=consts.ARBITER, idx=0,
                                suffix=suffix + ("dispatch_result", 0))
        payload = payload.unpack()

        degrees = payload.degree
        total_idx_list = payload.idx_list
        if self._secure_aggregate in ("paillier", "bfv", "ckks"):
            with phase("decryption"):
                lanes = self._block.decrypt(np.asarray(payload.lanes),
                                            payload.n_elements)
        else:
            lanes = jnp.asarray(np.asarray(payload.lanes))
            if self._secure_aggregate == "flashe":
                with phase("decryption"):
                    lanes = self._block.decrypt(lanes, total_idx_list)

        n_summed = len(total_idx_list) if total_idx_list else None
        with phase("decoding"):
            flat = self._block.unquantize(lanes, payload.n_elements,
                                          n_summed)

        flat = flat / (degrees / self.degree)
        flat = self._block.unnormalize(flat)
        flat = flat / self.degree

        if self._sparsity != 1.0:
            flat = flat + self.weights_last_round
        return flat

    # -- loss / convergence ------------------------------------------------

    def send_loss(self, loss, degree=None, suffix=tuple()):
        self._loss_sync.send_loss(LossPayload(loss, degree), suffix)

    def get_converge_status(self, suffix=tuple()):
        return self._converge_sync.get_converge_status(suffix=suffix)


class Guest(Client):
    def register_aggregator(self, transfer_variables, sparsity=1.0,
                            secure_aggregate="plain",
                            secure_aggregate_args=None):
        self._sparsity = sparsity
        self._secure_aggregate = secure_aggregate
        self._secure_aggregate_args = secure_aggregate_args or {
            "mode": "parallel", "num_partitions": 1}
        self._block = _make_block("guest", secure_aggregate,
                                 secure_aggregate_args, transfer_variables)
        self._loss_sync = loss_sync.LossClient().register_loss_transfer(
            loss_transfer=transfer_variables.guest_loss)
        self._converge_sync = loss_sync.ConvergeClient().register_is_converge(
            is_converge_variable=transfer_variables.is_converge)
        self.from_arbiter = transfer_variables.arbiter_to_guest
        self.to_arbiter = transfer_variables.guest_to_arbiter
        return self


class Host(Client):
    def register_aggregator(self, transfer_variables, sparsity=1.0,
                            secure_aggregate="plain",
                            secure_aggregate_args=None):
        self._sparsity = sparsity
        self._secure_aggregate = secure_aggregate
        self._secure_aggregate_args = secure_aggregate_args or {
            "mode": "parallel", "num_partitions": 1}
        self._block = _make_block("host", secure_aggregate,
                                 secure_aggregate_args, transfer_variables)
        self._loss_sync = loss_sync.LossClient().register_loss_transfer(
            loss_transfer=transfer_variables.host_loss)
        self._converge_sync = loss_sync.ConvergeClient().register_is_converge(
            is_converge_variable=transfer_variables.is_converge)
        self.from_arbiter = transfer_variables.arbiter_to_host
        self.to_arbiter = transfer_variables.host_to_arbiter
        return self


def with_role(role, transfer_variable, sparsity=1.0,
              secure_aggregate="plain", secure_aggregate_args=None):
    """Factory matching the reference entry point (jzf_aggregator.py:1038)."""
    if role == consts.GUEST:
        return Guest().register_aggregator(transfer_variable, sparsity,
                                           secure_aggregate,
                                           secure_aggregate_args)
    if role == consts.HOST:
        return Host().register_aggregator(transfer_variable, sparsity,
                                          secure_aggregate,
                                          secure_aggregate_args)
    if role == consts.ARBITER:
        return Arbiter().register_aggregator(transfer_variable, sparsity,
                                             secure_aggregate,
                                             secure_aggregate_args)
    raise ValueError(f"role {role} not found")
