"""LayerNormalization matching reference deepctr/layers/normalization.py:18-51."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .base import ones_init, zeros_init


class LayerNormalization(nn.Module):
    axis: int = -1
    eps: float = 1e-9
    center: bool = True
    scale: bool = True

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=self.axis, keepdims=True)
        variance = jnp.mean(jnp.square(x - mean), axis=self.axis, keepdims=True)
        std = jnp.sqrt(variance + self.eps)
        out = (x - mean) / std
        if self.scale:
            gamma = self.param("gamma", ones_init(), (x.shape[-1],))
            out = out * gamma
        if self.center:
            beta = self.param("beta", zeros_init(), (x.shape[-1],))
            out = out + beta
        return out
