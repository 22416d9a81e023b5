"""Role-split quantizer (reference jzf_quantize.py Quantizing{Client,Arbiter}).

Implements the reference's *secure* path: each client derives per-layer
clip thresholds alpha from ACIQ applied to the running std of the previous
global model (no local min/max leaks the arbiter could see;
jzf_quantize.py:403-413), normalizes by running layer means, quantizes with
stochastic rounding, and corrects alpha by num_clients on the way back
(jzf_quantize.py:102-107).  The non-secure arbiter-assisted path
(help_quantize aggregating min/max) is also provided for parity.

All whole-model transforms are single fused segment kernels over the flat
vector (see flashe_tpu/nn/weights.py) — the TPU replacement for the
reference's per-layer multiprocessing loops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from flashe_tpu.nn.weights import WeightsCodec
from flashe_tpu.ops import quantize as qops
from flashe_tpu.quant.aciq import ACIQ

__all__ = ["QuantizingClient", "QuantizingArbiter", "quantized_zero"]


@functools.partial(jax.jit, static_argnames=("element_bits",))
def _quantize_flat(x, alpha_vec, element_bits, key):
    a = alpha_vec
    x = jnp.clip(x, -a, a) + a
    x = x * (np.float32((1 << element_bits) - 1) / 2.0) / a
    u = jax.random.uniform(key, x.shape, dtype=jnp.float32)
    return jnp.floor(x + u).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("element_bits", "num_clients"))
def _unquantize_flat(q, alpha_vec, element_bits, num_clients):
    a = alpha_vec * num_clients
    scale = (2.0 * a) / (np.float32((1 << element_bits) - 1) * num_clients)
    return q.astype(jnp.float32) * scale - a


def quantized_zero(element_bits: int, key) -> int:
    """Quantized 0.0 — alpha-independent: (2^eb - 1)/2 + U[0,1) floored.

    The reference obtains it via the 'zzz' pseudo-layer with alpha=1.0
    (jzf_aggregator.py:716-718, jzf_quantize.py:434-435); used to fill
    non-selected positions when densifying sparse uploads.
    """
    u = float(jax.random.uniform(key, ()))
    return int(np.floor(((1 << element_bits) - 1) / 2.0 + u))


class _QuantizingBase:
    def __init__(self, int_bits, batch, element_bits, secure):
        self.int_bits = int_bits
        self.batch = batch
        self.element_bits = element_bits
        self.secure = secure
        self.num_clients = None
        self.iter = 0

    def set_iter(self, it: int):
        self.iter = it

    def set_num_clients(self, n: int):
        self.num_clients = n

    @property
    def factor(self) -> int:
        return int(np.ceil(np.log2(self.num_clients)))


class QuantizingClient(_QuantizingBase):
    def __init__(self, int_bits, batch, element_bits, padding, secure,
                 seed: int = 0):
        super().__init__(int_bits, batch, element_bits, secure)
        self.padding = padding
        self.aciq = ACIQ(element_bits)
        self.codec: WeightsCodec | None = None
        self.past_mean = None  # (L,) np.float32 running layer means
        self.past_std = None  # (L,) running layer stds
        self.alpha = None  # (L,) alphas used this round
        self._key = jax.random.PRNGKey(seed)

    def set_codec(self, codec: WeightsCodec):
        """First-round layer bookkeeping (reference send/set_layer_size_list
        jzf_quantize.py:357-392: mean 0, std 1 priors)."""
        self.codec = codec
        self.past_mean = np.zeros(codec.n_layers, np.float32)
        self.past_std = np.ones(codec.n_layers, np.float32)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def compute_alphas(self) -> np.ndarray:
        alphas = np.array(
            [self.aciq.get_alpha_gaus_direct(s) for s in self.past_std],
            np.float32,
        )
        # sigma==0 (constant layer in the global model) still needs a clip
        # range for local updates (jzf_quantize.py:411-413)
        alphas[alphas == 0] = 0.1
        return alphas

    def quantize(self, flat: jnp.ndarray, alpha_override=None) -> jnp.ndarray:
        """flat f32 -> uint32 quantized values (or batched lanes)."""
        self.alpha = (
            self.compute_alphas() if alpha_override is None else alpha_override
        )
        alpha_vec = self.codec.spread(jnp.asarray(self.alpha))
        q = _quantize_flat(flat, alpha_vec, self.element_bits, self._next_key())
        if self.batch:
            q = qops.batch_lanes(q, self.int_bits, self.element_bits,
                                 self.factor)
        return q

    def unquantize(self, q: jnp.ndarray, n_elements: int | None = None,
                   n_clients: int | None = None):
        """Summed quantized values -> flat f32 (alpha * num_clients rule).

        n_clients overrides the registered client count when the round
        had dropouts: the offset correction must match the number of
        summands actually present in the aggregate."""
        n = self.codec.total if n_elements is None else n_elements
        if self.batch:
            q = qops.unbatch_lanes(q, n, self.int_bits, self.element_bits,
                                   self.factor)
        alpha_vec = self.codec.spread(jnp.asarray(self.alpha))[:n]
        return _unquantize_flat(q, alpha_vec, self.element_bits,
                                n_clients or self.num_clients)

    def normalize(self, flat: jnp.ndarray) -> jnp.ndarray:
        """Subtract running layer means (jzf_quantize.py:542-547)."""
        return flat - self.codec.spread(jnp.asarray(self.past_mean))

    def unnormalize(self, flat: jnp.ndarray) -> jnp.ndarray:
        """Add means back and refresh running stats from the new global
        model (jzf_quantize.py:549-564)."""
        flat = flat + self.codec.spread(jnp.asarray(self.past_mean))
        mean, std = self.codec.layer_mean_std(flat)
        self.past_mean = np.asarray(mean)
        self.past_std = np.asarray(std)
        return flat

    def quantized_zero(self) -> int:
        return quantized_zero(self.element_bits, self._next_key())

    # -- sparse (compacted) variants: per-element gather of layer scalars --

    def _gather(self, per_layer, locations):
        seg = jnp.take(self.codec.segment_ids, jnp.asarray(locations))
        return jnp.take(jnp.asarray(per_layer), seg)

    def normalize_gather(self, values, locations):
        return jnp.asarray(values) - self._gather(self.past_mean, locations)

    def quantize_gather(self, values, locations):
        """Quantize a compacted top-s% vector with per-position alphas."""
        self.alpha = self.compute_alphas()
        alpha_vec = self._gather(self.alpha, locations)
        return _quantize_flat(jnp.asarray(values), alpha_vec,
                              self.element_bits, self._next_key())

    # non-secure path helpers (arbiter-assisted clipping)
    def local_min_max(self, flat: jnp.ndarray):
        s1 = jax.ops.segment_min(flat, self.codec.segment_ids,
                                 self.codec.n_layers)
        s2 = jax.ops.segment_max(flat, self.codec.segment_ids,
                                 self.codec.n_layers)
        return np.asarray(s1), np.asarray(s2)


class QuantizingArbiter(_QuantizingBase):
    """Arbiter-side helper: broadcasts num_clients; in the non-secure mode
    aggregates per-layer min/max into ACIQ alphas (jzf_quantize.py:308-333).
    Channel plumbing lives in the protocol blocks."""

    def __init__(self, int_bits, batch, element_bits, secure):
        super().__init__(int_bits, batch, element_bits, secure)
        self.aciq = ACIQ(element_bits)
        self.layer_sizes = None

    def set_layer_sizes(self, sizes):
        self.layer_sizes = list(sizes)

    def help_quantize(self, min_lists, max_lists):
        """min/max_lists: per-client (L,) arrays -> broadcast alphas."""
        if self.secure:
            return None
        mins = np.min(np.stack(min_lists), axis=0)
        maxs = np.max(np.stack(max_lists), axis=0)
        return np.array(
            [
                self.aciq.get_alpha_gaus(mins[i], maxs[i], size)
                for i, size in enumerate(self.layer_sizes)
            ],
            np.float32,
        )
