"""Interaction layers (FM family, cross networks, attention interactions).

Reference behavior contract: deepctr/layers/interaction.py. Implemented as
flax modules / pure functions over (B, F, E) field-embedding tensors; the
pairwise interactions are expressed as batched matmuls/einsums so XLA keeps
them on the MXU instead of materializing O(F^2) loops.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import glorot_normal, glorot_uniform, l2_reg, ones_init, truncated_normal, zeros_init


class FM(nn.Module):
    """Factorization Machine pairwise term (reference interaction.py:563-607).

    Input (B, F, E) -> 0.5 * sum_E[(sum_F e)^2 - sum_F e^2] -> (B, 1).
    """

    @nn.compact
    def __call__(self, inputs):
        if inputs.ndim != 3:
            raise ValueError(
                "Unexpected inputs dimensions %d, expect to be 3 dimensions" % inputs.ndim
            )
        square_of_sum = jnp.square(jnp.sum(inputs, axis=1, keepdims=True))
        sum_of_square = jnp.sum(inputs * inputs, axis=1, keepdims=True)
        cross_term = square_of_sum - sum_of_square
        return 0.5 * jnp.sum(cross_term, axis=2, keepdims=False)
