"""Core layers: DNN, LocalActivationUnit, PredictionLayer, RegulationModule.

Reference behavior contract: deepctr/layers/core.py:28-321.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .activation import activation_fn, activation_layer  # noqa: F401  (reference export parity)
from .base import cast_cd, compute_dtype, glorot_normal, l2_reg, ones_init, zeros_init


class DNN(nn.Module):
    """MLP tower (reference core.py:123-223).

    Per layer: x @ kernel + bias -> (BatchNorm?) -> activation -> dropout.
    ``output_activation`` overrides the activation of the final layer.
    All matmuls run with fp32 accumulation on the MXU.
    """

    hidden_units: Tuple[int, ...]
    activation: Any = "relu"
    l2_reg: float = 0.0
    dropout_rate: float = 0.0
    use_bn: bool = False
    output_activation: Any = None
    seed: int = 1024

    @nn.compact
    def __call__(self, x, training: bool = False):
        cd = compute_dtype()
        h = x.astype(cd)
        n = len(self.hidden_units)
        for i, units in enumerate(self.hidden_units):
            kernel = self.param(
                "kernel" + str(i), glorot_normal(), (h.shape[-1], units)
            )
            bias = self.param("bias" + str(i), zeros_init(), (units,))
            l2_reg(self, self.l2_reg, kernel)
            # bf16 compute dtype: cast params at use, accumulate f32 on the
            # MXU, store the activation back in bf16
            h = (
                jax.lax.dot_general(
                    h,
                    kernel.astype(cd),
                    dimension_numbers=(((h.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cd)
                + bias.astype(cd)
            )
            if self.use_bn:
                h = nn.BatchNorm(use_running_average=not training, momentum=0.99)(h)
            act = (
                self.output_activation
                if (i == n - 1 and self.output_activation)
                else self.activation
            )
            h = activation_fn(act)(h, training=training)
            if self.dropout_rate:
                h = nn.Dropout(rate=self.dropout_rate, deterministic=not training)(h)
        return h


class LocalActivationUnit(nn.Module):
    """DIN attention MLP over [q, k, q-k, q*k] -> per-step score.

    Inputs: query (B, 1, E), keys (B, T, E). Output: (B, T, 1).
    Reference: core.py:28-120.
    """

    hidden_units: Tuple[int, ...] = (64, 32)
    activation: Any = "sigmoid"
    l2_reg: float = 0.0
    dropout_rate: float = 0.0
    use_bn: bool = False
    seed: int = 1024

    @nn.compact
    def __call__(self, query, keys, training: bool = False):
        if query.ndim != 3 or keys.ndim != 3:
            raise ValueError("LocalActivationUnit expects 3D (query, keys)")
        if query.shape[-1] != keys.shape[-1] or query.shape[1] != 1:
            raise ValueError(
                "LocalActivationUnit requires shapes (B,1,E) and (B,T,E), got %s %s"
                % (query.shape, keys.shape)
            )
        T = keys.shape[1]
        queries = jnp.repeat(query, T, axis=1)
        att_input = jnp.concatenate(
            [queries, keys, queries - keys, queries * keys], axis=-1
        )
        att_out = DNN(
            tuple(self.hidden_units),
            self.activation,
            self.l2_reg,
            self.dropout_rate,
            self.use_bn,
            seed=self.seed,
        )(att_input, training=training)
        size = 4 * query.shape[-1] if len(self.hidden_units) == 0 else self.hidden_units[-1]
        kernel = self.param("kernel", glorot_normal(), (size, 1))
        bias = self.param("bias", zeros_init(), (1,))
        score = (
            jax.lax.dot_general(
                att_out,
                cast_cd(kernel),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bias
        )
        return score  # (B, T, 1), f32 (scores feed masked softmax)


class PredictionLayer(nn.Module):
    """Global bias + task link (reference core.py:226-267)."""

    task: str = "binary"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        if self.task not in ("binary", "multiclass", "regression"):
            raise ValueError("task must be binary,multiclass or regression")
        x = x.astype(jnp.float32)  # logits/probabilities always f32
        if self.use_bias:
            bias = self.param("global_bias", zeros_init(), (1,))
            x = x + bias
        if self.task == "binary":
            x = jax.nn.sigmoid(x)
        return x.reshape(-1, 1)


class RegulationModule(nn.Module):
    """EDCN field-wise gating (reference core.py:270-321).

    Input (B, F, E) -> softmax(g / tau) field gates -> flatten to (B, F*E).
    """

    tau: float = 1.0

    @nn.compact
    def __call__(self, x):
        if self.tau == 0:
            raise ValueError("RegulationModule tau can not be zero.")
        if x.ndim != 3:
            raise ValueError("RegulationModule expects (B, F, E), got %s" % (x.shape,))
        B, F, E = x.shape
        g = self.param("field_weight", ones_init(), (1, F, 1))
        gates = jax.nn.softmax(g * (1.0 / self.tau), axis=1)
        return (x * gates).reshape(-1, F * E)
