"""Local training harness (reference KerasNNModel, jzf_nn_model.py:117-218).

A thin flax/optax trainer: jitted SGD/Adam steps over minibatches, loss and
accuracy evaluation, params get/set for the aggregation loop.  The
reference's NNModel interface (nn_model.py:48-51 get/set_model_weights,
train, evaluate, modify) maps 1:1.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

__all__ = ["LocalTrainer", "make_optimizer"]


def make_optimizer(name: str, learning_rate: float):
    name = name.lower()
    if name == "adam":
        return optax.adam(learning_rate)
    if name == "sgd":
        return optax.sgd(learning_rate)
    if name == "rmsprop":
        return optax.rmsprop(learning_rate)
    raise ValueError(f"unknown optimizer {name}")


def _softmax_ce(logits, labels, pad_id=None):
    """Mean softmax CE over integer labels; with pad_id set, positions
    whose label equals pad_id are masked out (Keras Embedding mask_zero
    semantics for the reference's sequence workloads,
    jzf_nn_model.py nn_define `mask_zero: true`)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if pad_id is None:
        return ce.mean()
    w = (labels != pad_id).astype(ce.dtype)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


class LocalTrainer:
    def __init__(self, model, params, optimizer: str = "adam",
                 learning_rate: float = 5e-4, seed: int = 0,
                 label_pad_id: int | None = None):
        self.model = model
        self.params = params
        self.tx = make_optimizer(optimizer, learning_rate)
        self.opt_state = self.tx.init(params)
        self._rng = jax.random.PRNGKey(seed)
        pad_id = label_pad_id

        def loss_fn(params, x, y, rng):
            logits = model.apply({"params": params}, x, train=True,
                                 rngs={"dropout": rng})
            return _softmax_ce(logits, y, pad_id)

        @jax.jit
        def train_step(params, opt_state, x, y, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y, rng)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def eval_step(params, x, y):
            logits = model.apply({"params": params}, x, train=False)
            loss = _softmax_ce(logits, y, pad_id)
            hit = (jnp.argmax(logits, -1) == y)
            if pad_id is not None:
                w = (y != pad_id).astype(jnp.float32)
                acc = jnp.sum(hit * w) / jnp.maximum(jnp.sum(w), 1.0)
            else:
                acc = jnp.mean(hit)
            return loss, acc

        self._train_step = train_step
        self._eval_step = eval_step

    def get_model_weights(self):
        return self.params

    def set_model_weights(self, params):
        self.params = params
        # keep optimizer moments: the reference resets nothing on modify()

    def modify(self, fn):
        """reference nn_model.modify: params = fn(params)."""
        self.params = fn(self.params)
        return self.params

    def train(self, x: np.ndarray, y: np.ndarray, epochs: int = 1,
              batch_size: int = 128) -> float:
        n = x.shape[0]
        losses = []
        for _ in range(epochs):
            self._rng, perm_key = jax.random.split(self._rng)
            perm = np.asarray(jax.random.permutation(perm_key, n))
            for b in range(0, n - batch_size + 1, batch_size) or [0]:
                xb = jnp.asarray(x[perm[b : b + batch_size]])
                yb = jnp.asarray(y[perm[b : b + batch_size]])
                self._rng, step_key = jax.random.split(self._rng)
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, xb, yb, step_key)
                losses.append(float(loss))
        return float(np.mean(losses)) if losses else 0.0

    def evaluate(self, x: np.ndarray, y: np.ndarray,
                 batch_size: int = 512) -> Tuple[float, float]:
        n = x.shape[0]
        tot_loss, tot_acc, seen = 0.0, 0.0, 0
        for b in range(0, n, batch_size):
            xb = jnp.asarray(x[b : b + batch_size])
            yb = jnp.asarray(y[b : b + batch_size])
            loss, acc = self._eval_step(self.params, xb, yb)
            k = xb.shape[0]
            tot_loss += float(loss) * k
            tot_acc += float(acc) * k
            seen += k
        return tot_loss / max(seen, 1), tot_acc / max(seen, 1)

    def predict(self, x: np.ndarray, batch_size: int = 512) -> np.ndarray:
        outs = []
        for b in range(0, x.shape[0], batch_size):
            logits = self.model.apply(
                {"params": self.params}, jnp.asarray(x[b : b + batch_size]),
                train=False)
            outs.append(np.asarray(jax.nn.softmax(logits, -1)))
        return np.concatenate(outs) if outs else np.zeros((0,))
