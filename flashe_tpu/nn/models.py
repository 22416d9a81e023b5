"""Flax model zoo mirroring the reference workloads.

Reference (examples/configs/*/train_job_conf.json nn_define, Keras/TF1):
- FEMNIST CNN: Conv32-3x3/relu -> Conv64-3x3/relu -> maxpool2 -> dropout
  -> dense128/relu -> dropout -> dense62/softmax (1,206,590 params),
- CIFAR-10 ResNet (CIFAR-style residual stacks),
- Shakespeare char-LSTM: embed -> 2x LSTM(256) -> dense(vocab).

All models are bfloat16-friendly and MXU-shaped (channel dims multiples of
8/128 where the reference allows).  `build_model(name, **kw)` is the
registry entry point the HomoNN component resolves through, standing in
for the reference's nn_define JSON -> Keras builder
(federatedml/nn/backend/tf_keras/jzf_nn_model.py:99-109).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["build_model", "FemnistCNN", "CifarResNet", "CharLSTM", "MLP"]


class MLP(nn.Module):
    features: Sequence[int] = (64, 10)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        for f in self.features[:-1]:
            x = nn.relu(nn.Dense(f)(x))
        return nn.Dense(self.features[-1])(x)


class FemnistCNN(nn.Module):
    """The FEMNIST CNN (cnn_* configs)."""

    num_classes: int = 62

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape((x.shape[0], 28, 28, 1))
        x = nn.relu(nn.Conv(32, (3, 3), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="VALID")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(128)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)


class _ResBlock(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides,) * 2,
                    padding="SAME", use_bias=False)(x)
        y = nn.GroupNorm(num_groups=8)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False)(y)
        y = nn.GroupNorm(num_groups=8)(y)
        if x.shape[-1] != self.filters or self.strides != 1:
            x = nn.Conv(self.filters, (1, 1), strides=(self.strides,) * 2,
                        use_bias=False)(x)
        return nn.relu(x + y)


class CifarResNet(nn.Module):
    """CIFAR-style ResNet (resnet_* configs).  GroupNorm instead of
    BatchNorm: running batch statistics do not aggregate meaningfully
    under FedAvg, and GN keeps the forward pass purely functional."""

    num_classes: int = 10
    stage_sizes: Sequence[int] = (2, 2, 2)
    width: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.width, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.relu(nn.GroupNorm(num_groups=8)(x))
        for stage, blocks in enumerate(self.stage_sizes):
            filters = self.width * (2 ** stage)
            for b in range(blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = _ResBlock(filters, strides)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


class CharLSTM(nn.Module):
    """Shakespeare next-char model (lstm_* configs): embed -> stacked LSTM
    -> dense(vocab), predicting the next token from the last position
    (the reference's create_label construction, enter_point.py:158-166)."""

    vocab: int = 80
    embed: int = 8
    hidden: int = 256
    layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Embed(self.vocab, self.embed)(x)
        for _ in range(self.layers):
            h = nn.RNN(nn.OptimizedLSTMCell(self.hidden))(h)
        return nn.Dense(self.vocab)(h[:, -1, :])


_REGISTRY: Dict[str, Callable[..., nn.Module]] = {
    "mlp": MLP,
    "cnn": FemnistCNN,
    "femnist_cnn": FemnistCNN,
    "resnet": CifarResNet,
    "cifar_resnet": CifarResNet,
    "lstm": CharLSTM,
    "char_lstm": CharLSTM,
}


def build_model(name: str, **kwargs: Any) -> nn.Module:
    if name in ("keras", "nn_define"):
        # a Keras-JSON nn_define from a reference-style job conf
        # (federatedml/nn/backend/tf_keras/jzf_nn_model.py:99-109)
        import json

        from flashe_tpu.nn.keras_define import KerasDefineModel

        define = kwargs["nn_define"]
        if not isinstance(define, str):
            define = json.dumps(define)
        return KerasDefineModel(define)
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def init_params(model: nn.Module, input_example, seed: int = 0):
    return model.init(jax.random.PRNGKey(seed), input_example)["params"]
