"""Attention-GRU cells (QAAttGRUCell / VecAttGRUCell) as flax modules.

Reference: /root/reference/deepctr/contrib/utils.py:149 (QAAttGRUCell) and
:264 (VecAttGRUCell) — TF1 ``RNNCell`` subclasses built from a ``_Linear``
helper, with gate bias initialized to 1.0 and candidate bias to 0.

TPU-first redesign: each cell is a step function ``(inputs, state,
att_score) -> (output, new_state)`` expressed as a flax module, so it can
be driven by :func:`deepctr_tpu.contrib.rnn.dynamic_rnn` (a ``lax.scan``)
or embedded in any custom model. Parameter names and shapes are identical
to ``layers.sequence._GRUScan`` — ``gate_kernel (E+U, 2U)``, ``gate_bias``
(init 1.0), ``candidate_kernel (E+U, U)``, ``candidate_bias`` (init 0) —
so cell-built models are weight-compatible with the built-in
``DynamicGRU`` layer (and its fused Pallas kernel path).

Math (matching the reference cells bit-for-bit at f32):
    r, u = sigmoid([x, h] @ Wg + bg)
    c    = act([x, r*h] @ Wc + bc)           # act default tanh
    QAAtt (AGRU):  h' = (1 - a) * h + a * c          # a replaces update gate
    VecAtt (AUGRU): u' = (1 - a) * u ; h' = u' * h + (1 - u') * c
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["QAAttGRUCell", "VecAttGRUCell"]

# flax initializers directly (not layers.base wrappers) to keep contrib
# importable without the layers package — layers.sequence re-exports these
# cells, so importing layers here would be circular.
glorot_uniform = nn.initializers.glorot_uniform
ones_init = nn.initializers.ones_init
zeros_init = nn.initializers.zeros_init


class _AttGRUCellBase(nn.Module):
    """Shared gate/candidate machinery for the attention GRU cells."""

    num_units: int
    activation: Optional[Callable[[Any], Any]] = None
    kernel_initializer: Optional[Any] = None
    bias_initializer: Optional[Any] = None

    @property
    def state_size(self) -> int:  # reference RNNCell API parity
        return self.num_units

    @property
    def output_size(self) -> int:
        return self.num_units

    def zero_state(self, batch_size: int, dtype=jnp.float32):
        """TF RNNCell API: the all-zeros initial state."""
        return jnp.zeros((batch_size, self.num_units), dtype)

    def _gates_and_candidate(self, inputs, state):
        U = self.num_units
        E = inputs.shape[-1]
        kinit = self.kernel_initializer or glorot_uniform()
        # reference: gate bias defaults to constant 1.0 even when a custom
        # bias_initializer is None (contrib/utils.py "bias_ones")
        gbinit = self.bias_initializer or ones_init()
        cbinit = self.bias_initializer or zeros_init()
        gate_kernel = self.param("gate_kernel", kinit, (E + U, 2 * U))
        gate_bias = self.param("gate_bias", gbinit, (2 * U,))
        cand_kernel = self.param("candidate_kernel", kinit, (E + U, U))
        cand_bias = self.param("candidate_bias", cbinit, (U,))
        xh = jnp.concatenate([inputs, state], axis=-1)
        gates = jax.nn.sigmoid(
            jnp.dot(xh, gate_kernel, preferred_element_type=jnp.float32)
            + gate_bias)
        r, u = jnp.split(gates, 2, axis=-1)
        xrh = jnp.concatenate([inputs, r * state], axis=-1)
        act = self.activation or jnp.tanh
        c = act(
            jnp.dot(xrh, cand_kernel, preferred_element_type=jnp.float32)
            + cand_bias)
        return u, c

    @staticmethod
    def _att(att_score, state):
        if att_score is None:
            raise ValueError(
                "attention GRU cells require att_score (B, 1) per step; "
                "use a plain GRU (DynamicGRU gru_type='GRU') otherwise")
        return jnp.reshape(att_score, (state.shape[0], 1))


class QAAttGRUCell(_AttGRUCellBase):
    """GRU cell whose update gate is REPLACED by the attention score (AGRU).

    Reference: /root/reference/deepctr/contrib/utils.py:149-263.
    """

    @nn.compact
    def __call__(self, inputs, state, att_score=None):
        u, c = self._gates_and_candidate(inputs, state)
        a = self._att(att_score, state)
        new_h = (1.0 - a) * state + a * c
        return new_h, new_h


class VecAttGRUCell(_AttGRUCellBase):
    """GRU cell whose update gate is SCALED by the attention score (AUGRU).

    Reference: /root/reference/deepctr/contrib/utils.py:264-378.
    """

    @nn.compact
    def __call__(self, inputs, state, att_score=None):
        u, c = self._gates_and_candidate(inputs, state)
        a = self._att(att_score, state)
        u = (1.0 - a) * u
        new_h = u * state + (1.0 - u) * c
        return new_h, new_h
