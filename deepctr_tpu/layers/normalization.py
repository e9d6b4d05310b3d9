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
        # statistics in f32 regardless of the activation dtype (bf16 mean/
        # variance over the feature axis loses too much precision); the
        # casts fuse into the normalization chain, output keeps x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=self.axis, keepdims=True)
        variance = jnp.mean(jnp.square(xf - mean), axis=self.axis, keepdims=True)
        std = jnp.sqrt(variance + self.eps)
        out = ((xf - mean) / std).astype(x.dtype)
        if self.scale:
            gamma = self.param("gamma", ones_init(), (x.shape[-1],))
            out = out * gamma.astype(out.dtype)
        if self.center:
            beta = self.param("beta", zeros_init(), (x.shape[-1],))
            out = out + beta.astype(out.dtype)
        return out
