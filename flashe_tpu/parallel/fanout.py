"""Batch-axis fan-out over a party's local devices.

The reference parallelizes every HE scheme inside one silo with a
`multiprocessing.Pool` over contiguous index chunks — Paillier
per-element (jzf_paillier.py:190-237), BFV per-ciphertext
(jzf_bfv.py:116-173).  The TPU-native equivalent for *batch-row*
kernels (Paillier modexp rows, BFV/CKKS ciphertext rows) is simpler
than a mesh: split the batch axis into contiguous chunks, commit one
chunk per local device, and dispatch the same jitted kernel on each —
JAX's async dispatch runs the chunks concurrently with no collectives
(the rows are independent), and results gather on the host exactly
where these call sites already download them (Paillier's host CRT
assembly, BFV's CRT rounding, CKKS's host FFT decode, the wire
serialization boundary).

Contrast with parallel/party.LocalLaneMesh, which shard_maps FLASHE's
*lane* axis (one logical vector split across devices, counter-offset
mask streams keeping it bit-exact); here whole independent rows fan
out, so plain per-device dispatch is the right tool.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax

__all__ = ["DeviceFanout"]


class DeviceFanout:
    """Round-robin contiguous batch-axis fan-out over local devices."""

    def __init__(self, n_shards=None, devices=None):
        devices = list(devices if devices is not None else
                       jax.local_devices())
        if n_shards in (None, "all"):
            n_shards = len(devices)
        n_shards = int(n_shards)
        if n_shards > len(devices):
            raise ValueError(
                f"n_shards={n_shards} > {len(devices)} local devices")
        self.devices = devices[:max(n_shards, 1)]
        self.n_shards = max(n_shards, 1)

    def spans(self, B: int) -> List[Tuple[int, int]]:
        """Balanced contiguous [lo, hi) spans of a batch of B rows
        (at most n_shards spans; empty spans are dropped, so B < n_shards
        still works)."""
        base, rem = divmod(B, self.n_shards)
        spans, lo = [], 0
        for i in range(self.n_shards):
            size = base + (1 if i < rem else 0)
            if size:
                spans.append((lo, lo + size))
                lo += size
        return spans

    def run(self, fn, *arrays):
        """fn(shard_index, *chunks) per device over axis-0 chunks.

        Each batch array is sliced into contiguous spans and committed
        to its device (jax.device_put), so the jitted work inside `fn`
        runs there; all shards dispatch before any result is awaited.
        fn may return one array or a tuple of arrays (concatenated
        per-position).  Results return as host numpy arrays.
        """
        B = arrays[0].shape[0]
        spans = self.spans(B)
        outs = []
        for i, ((lo, hi), dev) in enumerate(zip(spans, self.devices)):
            chunks = [jax.device_put(a[lo:hi], dev) for a in arrays]
            outs.append(fn(i, *chunks))
        # fetch every shard's output in ONE device_get: each separate
        # np.asarray pays a full host round-trip (measured ~26 ms
        # through a network-attached tunnel, size-independent), so the
        # gather must not scale RTTs with shard count
        outs = jax.device_get(outs)
        if isinstance(outs[0], tuple):
            return tuple(
                np.concatenate([np.asarray(o[j]) for o in outs])
                for j in range(len(outs[0])))
        return np.concatenate([np.asarray(o) for o in outs])
