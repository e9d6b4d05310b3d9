"""Activations: Dice and the string->fn activation resolver.

Reference behavior: deepctr/layers/activation.py:28-85.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import zeros_init


class Dice(nn.Module):
    """Data-adaptive activation from DIN (reference activation.py:28-72).

    ``x_p = sigmoid(BN(x))``; output ``alpha * (1-x_p) * x + x_p * x`` with a
    learnable per-channel ``alpha`` (zeros init) and a center/scale-free BN.
    """

    axis: int = -1
    epsilon: float = 1e-9

    @nn.compact
    def __call__(self, x, training: bool = False):
        normed = nn.BatchNorm(
            use_running_average=not training,
            axis=self.axis,
            epsilon=self.epsilon,
            use_bias=False,
            use_scale=False,
            momentum=0.99,
        )(x)
        alpha = self.param("dice_alpha", zeros_init(), (x.shape[-1],))
        x_p = jax.nn.sigmoid(normed)
        return alpha * (1.0 - x_p) * x + x_p * x


_STR_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "linear": lambda x: x,
    "softmax": jax.nn.softmax,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
    "silu": jax.nn.silu,
    "leaky_relu": jax.nn.leaky_relu,
}


def activation_fn(activation: Any):
    """Resolve an activation spec (reference activation.py:75-85).

    Accepts a string name, 'dice'/'Dice' (returns a fresh Dice module), a
    flax Module class, a Module instance, or a plain callable. Returns a
    callable ``fn(x, training=False)``.
    """
    if activation in ("dice", "Dice"):
        mod = Dice()
        return lambda x, training=False: mod(x, training=training)
    if isinstance(activation, str):
        if activation not in _STR_ACTIVATIONS:
            raise ValueError("Invalid activation,found %s" % activation)
        fn = _STR_ACTIVATIONS[activation]
        return lambda x, training=False: fn(x)
    if isinstance(activation, type) and issubclass(activation, nn.Module):
        mod = activation()
        return lambda x, training=False: mod(x, training=training)
    if isinstance(activation, nn.Module):
        return lambda x, training=False: activation(x, training=training)
    if callable(activation):
        return lambda x, training=False: activation(x)
    raise ValueError(
        "Invalid activation,found %s.You should use a str or a Module class." % activation
    )


# Reference-name alias (reference activation.py:75-85 exports
# ``activation_layer``): returns a callable ``fn(x, training=False)`` rather
# than a Keras Layer — every call site in this framework treats it as one.
activation_layer = activation_fn
