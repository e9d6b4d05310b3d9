"""Functional ``dynamic_rnn`` driver over attention-GRU (or any) step cells.

Reference: /root/reference/deepctr/contrib/rnn.py:678 and rnn_v2.py:802 —
two ~1.2k-line forks of the TF1 while-loop RNN machinery (TensorArrays,
``_rnn_step`` copy-through, control-flow context plumbing). On TPU the
whole apparatus collapses into one ``flax.linen.scan`` over the time axis:
traced once, static shapes, per-step matmuls batched onto the MXU, and
the copy-through/zero-output semantics become two ``where`` masks.

Semantics preserved from the reference driver:
  - ``att_scores`` (B, T, 1) is sliced per step and passed to the cell
    (rnn.py:1056: ``att_score = att_scores[:, time, :]``).
  - ``sequence_length``: outputs are zero past each row's length and the
    state stops updating there (rnn.py:191 ``_rnn_step`` copy-through).
  - ``time_major`` toggles (T, B, E) vs (B, T, E) layouts.
  - returns ``(outputs, final_state)``.

``parallel_iterations`` / ``swap_memory`` / ``scope`` / ``dtype`` are
accepted for signature parity; they configure TF-runtime knobs with no
XLA equivalent (XLA schedules and fuses the scan itself).

Must be called inside a flax module (``setup``/``__call__``), like every
layer here — the reference equivalent also only works inside a Keras
graph. See docs/Custom-Models.md for a full DIEN-variant example.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["dynamic_rnn"]


def sequence_mask(lengths, maxlen, dtype=jnp.float32):
    # local copy of layers.base.sequence_mask — layers.sequence re-exports
    # this module's dynamic_rnn, so importing layers here would be circular
    lengths = lengths.reshape(lengths.shape[0], -1)[:, :1]
    pos = jnp.arange(maxlen, dtype=jnp.int32)[None, :]
    return (pos < lengths.astype(jnp.int32)).astype(dtype)


class _ScanStep(nn.Module):
    """One timestep: applies the user cell, then length masking."""

    cell: nn.Module
    has_att: bool
    masked: bool

    @nn.compact
    def __call__(self, carry, xs):
        x, a, m = xs
        h = carry
        if self.has_att:
            out, new_h = self.cell(x, h, a)
        else:
            out, new_h = self.cell(x, h)
        if self.masked:
            new_h = m * new_h + (1.0 - m) * h   # freeze state past seq end
            out = out * m                        # zero outputs past seq end
        return new_h, out


def dynamic_rnn(cell, inputs, att_scores=None, sequence_length=None,
                initial_state=None, dtype=None, parallel_iterations=None,
                swap_memory=False, time_major=False, scope=None):
    """Run ``cell`` over ``inputs`` with optional attention and lengths.

    Args:
      cell: a step module ``(x, h[, att_score]) -> (output, new_state)``,
        e.g. :class:`~deepctr_tpu.contrib.utils.VecAttGRUCell`.
      inputs: (B, T, E) — or (T, B, E) when ``time_major``.
      att_scores: optional (B, T, 1) attention scores.
      sequence_length: optional (B,) int valid lengths.
      initial_state: optional (B, U) initial state (default zeros).

    Returns:
      ``(outputs, final_state)``: (B, T, U) (layout follows ``time_major``)
      and (B, U).
    """
    del parallel_iterations, swap_memory, scope  # TF-runtime knobs; no-op
    if time_major:
        inputs = jnp.swapaxes(inputs, 0, 1)
    B, T, _ = inputs.shape
    out_dtype = dtype or inputs.dtype

    units = getattr(cell, "num_units", None) or getattr(cell, "state_size")
    if initial_state is None:
        h0 = jnp.zeros((B, units), out_dtype)
    else:
        h0 = initial_state

    xs = jnp.swapaxes(inputs, 0, 1)  # (T, B, E)
    if att_scores is not None:
        a_t = jnp.swapaxes(
            att_scores.reshape(B, T, -1)[:, :, :1], 0, 1)  # (T, B, 1)
    else:
        a_t = jnp.zeros((T, B, 1), out_dtype)
    if sequence_length is not None:
        m_t = jnp.swapaxes(
            sequence_mask(sequence_length, T), 0, 1)[:, :, None]
    else:
        m_t = jnp.ones((T, B, 1), out_dtype)

    scan = nn.scan(
        _ScanStep,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0, out_axes=0)(
            cell=cell,
            has_att=att_scores is not None,
            masked=sequence_length is not None)
    final_h, outputs = scan(h0, (xs, a_t, m_t))
    if not time_major:
        outputs = jnp.swapaxes(outputs, 0, 1)  # (B, T, U)
    return outputs, final_h
