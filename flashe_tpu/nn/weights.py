"""Stable model<->vector codec.

Replaces the reference's JZFOrderDictWeights walking order
(jzf_weights.py:436-444: layers visited in sorted(key) order) and the
aggregator's flatten/unflatten helpers (jzf_aggregator.py:625-671) with a
precompiled segment map over one flat f32 vector:

- `flatten` concatenates all leaves of a (flax) params pytree in sorted
  path order — the documented, machine-independent walking order,
- per-layer scalars (alpha, mean, ...) broadcast to elements through a
  static `segment_ids` array, so whole-model quantize/normalize run as one
  fused TPU kernel instead of a per-layer host loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["WeightsCodec"]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


class WeightsCodec:
    """Flatten/unflatten a params pytree with a stable walking order."""

    def __init__(self, template):
        leaves = jax.tree_util.tree_leaves_with_path(template)
        named = sorted(
            ((_path_str(path), leaf) for path, leaf in leaves),
            key=lambda kv: kv[0],
        )
        self.keys = [k for k, _ in named]
        self.shapes = [tuple(v.shape) for _, v in named]
        self.sizes = [int(np.prod(s)) if s else 1 for s in self.shapes]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        self.total = int(self.offsets[-1])
        self.n_layers = len(self.keys)
        self._treedef = jax.tree_util.tree_structure(template)
        # order mapping: tree_leaves order -> sorted order
        order = {k: i for i, (k, _) in enumerate(named)}
        self._leaf_order = [order[_path_str(p)] for p, _ in leaves]
        self.segment_ids = jnp.asarray(
            np.repeat(np.arange(self.n_layers), self.sizes), jnp.int32
        )

    def flatten(self, params) -> jnp.ndarray:
        leaves = jax.tree_util.tree_leaves(params)
        ordered = [None] * self.n_layers
        for leaf, pos in zip(leaves, self._leaf_order):
            ordered[pos] = leaf.reshape(-1).astype(jnp.float32)
        return jnp.concatenate(ordered)

    def unflatten(self, flat: jnp.ndarray):
        parts = [
            flat[self.offsets[i] : self.offsets[i + 1]].reshape(self.shapes[i])
            for i in range(self.n_layers)
        ]
        leaves = [parts[pos] for pos in self._leaf_order]
        return jax.tree_util.tree_unflatten(self._treedef, leaves)

    def spread(self, per_layer: jnp.ndarray) -> jnp.ndarray:
        """(n_layers,) -> (total,) by segment broadcast."""
        return jnp.take(per_layer, self.segment_ids)

    def layer_mean_std(self, flat: jnp.ndarray):
        """Per-layer running statistics of a flat vector -> ((L,), (L,))."""
        sizes = jnp.asarray(self.sizes, jnp.float32)
        s1 = jax.ops.segment_sum(flat, self.segment_ids, self.n_layers)
        s2 = jax.ops.segment_sum(flat * flat, self.segment_ids, self.n_layers)
        mean = s1 / sizes
        var = jnp.maximum(s2 / sizes - mean * mean, 0.0)
        return mean, jnp.sqrt(var)
