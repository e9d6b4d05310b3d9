"""Shared helpers for the TPU layer zoo (flax.linen modules over JAX/XLA)."""
from __future__ import annotations

import contextlib

import flax.linen as nn
import jax.numpy as jnp

# Same very-negative padding constant the reference uses for masked softmax
# (layers/sequence.py:171,281,587): finite, so exp() underflows to exactly 0.
MASK_PADDING = -(2.0 ** 32) + 1.0

# ---- mixed-precision compute dtype ------------------------------------
# CTR activations at large batch are real HBM traffic (a (32768, 26, 26)
# attention-score array is 177 MB in f32); bf16 compute halves it and the
# MXU natively consumes bf16 with f32 accumulation. The scope is consulted
# at TRACE time by the funnel and the hot layers; parameters stay f32
# (master weights) and are cast AT USE. Activate per model via
# ``model.compile(..., compute_dtype="bfloat16")`` (training/model.py
# wraps every network.apply in this scope).
_COMPUTE_DTYPE = [jnp.float32]


def compute_dtype():
    """The activation dtype for the current trace (f32 unless a
    compute_dtype_scope is active)."""
    return _COMPUTE_DTYPE[-1]


@contextlib.contextmanager
def compute_dtype_scope(dtype):
    _COMPUTE_DTYPE.append(jnp.dtype(dtype))
    try:
        yield
    finally:
        _COMPUTE_DTYPE.pop()


# ---- graph profile (auto mixed-precision policy) ----------------------
# The attention/CIN layers are the models where bf16 activations are a
# measured win (+25..77%, BASELINE.md round-3 tables): their (B,H,F,F)
# score arrays / CIN feature maps dominate HBM traffic. During the init
# trace those layers mark the profile; CTRModel resolves
# compute_dtype=None ("auto") to bf16 when the mark is present
# (training/model.py _resolved_compute_dtype).
_GRAPH_PROFILE = [None]


@contextlib.contextmanager
def graph_profile_scope(profile: dict):
    _GRAPH_PROFILE.append(profile)
    try:
        yield
    finally:
        _GRAPH_PROFILE.pop()


def note_mp_preferred():
    """Called by InteractingLayer / Transformer / CIN at trace time."""
    if _GRAPH_PROFILE[-1] is not None:
        _GRAPH_PROFILE[-1]["mp_preferred"] = True


# ---- rematerialization (activation recompute) -------------------------
# jax.checkpoint on the transformer blocks (BST/DSIN): numerically EXACT
# recompute-in-backward. MEASURED A NO-OP at CTR shapes (fresh-process
# A/Bs on v5e, scan 10/25: speed within 1%, temp buffers 3.39 -> 3.38 GB
# — XLA's scheduler already avoids saving these activations; an earlier
# "+23%" was an in-process measurement-order artifact). Kept OPT-IN via
# CTRModel.compile(remat=True) for regimes XLA may not cover (much longer
# sequences); default off everywhere.
_REMAT = [False]


def remat_enabled():
    return bool(_REMAT[-1])


@contextlib.contextmanager
def remat_scope(enabled):
    _REMAT.append(enabled)
    try:
        yield
    finally:
        _REMAT.pop()


def cast_cd(*arrays):
    """Cast arrays to the active compute dtype (no-op trees in f32 mode)."""
    cd = compute_dtype()
    out = tuple(a if a is None else a.astype(cd) for a in arrays)
    return out[0] if len(out) == 1 else out


def glorot_normal():
    return nn.initializers.glorot_normal()


def glorot_uniform():
    return nn.initializers.glorot_uniform()


def zeros_init():
    return nn.initializers.zeros_init()


def ones_init():
    return nn.initializers.ones_init()


def truncated_normal(stddev=0.05, mean=0.0):
    if mean != 0.0:
        def init(key, shape, dtype=jnp.float32):
            import jax
            return mean + stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
        return init
    return nn.initializers.truncated_normal(stddev=stddev)


def add_reg_loss(module: nn.Module, value):
    """Accumulate an l2-style regularization term into the 'losses' collection.

    The trainer sums every leaf of the 'losses' collection into the total loss,
    replacing the Keras regularizer-collection mechanism the reference relies
    on (reference inputs.py:22, layers/core.py:170).
    """
    module.sow(
        "losses",
        "reg_loss",
        value,
        init_fn=lambda: jnp.zeros((), jnp.float32),
        reduce_fn=lambda a, b: a + b,
    )


def l2_reg(module: nn.Module, coef: float, *weights):
    if coef:
        total = jnp.zeros((), jnp.float32)
        for w in weights:
            total = total + jnp.sum(jnp.square(w.astype(jnp.float32)))
        add_reg_loss(module, coef * total)


def add_aux_loss(module: nn.Module, value):
    """Record a model auxiliary loss (e.g. DIEN, reference dien.py:213)."""
    module.sow(
        "losses",
        "aux_loss",
        value,
        init_fn=lambda: jnp.zeros((), jnp.float32),
        reduce_fn=lambda a, b: a + b,
    )


def sequence_mask(lengths, maxlen, dtype=jnp.float32):
    """(B,1) or (B,) lengths -> (B, maxlen) mask. Replaces tf.sequence_mask."""
    lengths = lengths.reshape(lengths.shape[0], -1)[:, :1]
    pos = jnp.arange(maxlen, dtype=jnp.int32)[None, :]
    return (pos < lengths.astype(jnp.int32)).astype(dtype)
