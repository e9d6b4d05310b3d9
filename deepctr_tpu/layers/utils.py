"""Layer utilities: Linear logit, concat/add helpers, DNN input assembly.

Reference behavior contract: deepctr/layers/utils.py:124-346. The Keras
mask-propagation machinery (NoMask/Concat compute_mask) is intentionally
absent — masks are explicit arrays threaded by the caller.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import glorot_normal, l2_reg, zeros_init


class Linear(nn.Module):
    """Wide/linear logit (reference layers/utils.py:124-186).

    mode 0: sparse only — sum of dim-1 embeddings.
    mode 1: dense only — dense @ kernel.
    mode 2: both.
    Input sparse: (B, 1, F) concat of dim-1 embeddings; dense: (B, D).
    Output: (B, 1).
    """

    l2_reg: float = 0.0
    mode: int = 0
    use_bias: bool = False
    seed: int = 1024

    @nn.compact
    def __call__(self, sparse_input=None, dense_input=None):
        if self.mode not in (0, 1, 2):
            raise ValueError("mode must be 0,1 or 2")
        if self.mode == 0:
            logit = jnp.sum(sparse_input, axis=-1)  # (B, 1, F) -> (B, 1)
            logit = logit.reshape(logit.shape[0], -1)[:, :1]
        elif self.mode == 1:
            kernel = self.param("linear_kernel", glorot_normal(), (dense_input.shape[-1], 1))
            l2_reg(self, self.l2_reg, kernel)
            logit = jnp.dot(dense_input, kernel, preferred_element_type=jnp.float32)
        else:
            kernel = self.param("linear_kernel", glorot_normal(), (dense_input.shape[-1], 1))
            l2_reg(self, self.l2_reg, kernel)
            fc = jnp.dot(dense_input, kernel, preferred_element_type=jnp.float32)
            sparse_logit = jnp.sum(sparse_input, axis=-1).reshape(fc.shape[0], -1)[:, :1]
            logit = sparse_logit + fc
        if self.use_bias:
            bias = self.param("linear_bias", zeros_init(), (1,))
            logit = logit + bias
        return logit.reshape(-1, 1)


def concat_func(inputs, axis=-1):
    """Concat a list of arrays; identity for singletons (utils.py:236-242)."""
    if len(inputs) == 1:
        return inputs[0]
    return jnp.concatenate(inputs, axis=axis)


def add_func(inputs):
    """Sum a list of logits; 0 constant for empty (utils.py:313-333)."""
    if not isinstance(inputs, (list, tuple)):
        return inputs
    if len(inputs) == 0:
        return jnp.zeros((1, 1), jnp.float32)
    if len(inputs) == 1:
        return inputs[0]
    out = inputs[0]
    for t in inputs[1:]:
        out = out + t
    return out


def flatten(x):
    """Keras Flatten: collapse all non-batch dims."""
    return x.reshape(x.shape[0], -1)


def combined_dnn_input(sparse_embedding_list, dense_value_list):
    """Assemble the DNN input from sparse embeddings (each (B,1,E)) and dense
    values (each (B,D)) — reference utils.py:336-346."""
    if len(sparse_embedding_list) > 0 and len(dense_value_list) > 0:
        sparse_dnn_input = flatten(concat_func(sparse_embedding_list))
        dense_dnn_input = flatten(concat_func(dense_value_list))
        return concat_func([sparse_dnn_input, dense_dnn_input])
    elif len(sparse_embedding_list) > 0:
        return flatten(concat_func(sparse_embedding_list))
    elif len(dense_value_list) > 0:
        return flatten(concat_func(dense_value_list))
    raise NotImplementedError("dnn_feature_columns can not be empty list")


def softmax(logits, axis=-1):
    return jax.nn.softmax(logits, axis=axis)


# ---------------------------------------------------------------------------
# Drop-in migration shims for the rest of the reference's layers.utils
# surface (utils.py:26-39 NoMask, 41-121 Hash, 189-233 Concat, 245-310
# reduce_*/div). Masks are explicit in this framework, so NoMask/Concat
# carry no mask machinery; Hash runs on HOST arrays (TPU has no string
# ops — the feature pipeline hashes in canonicalize_batch, this class
# exists for code that called the layer directly).
# ---------------------------------------------------------------------------


class NoMask:
    """Identity; the reference uses it to strip Keras masks (utils.py:26-39).
    Masks are explicit here, so this is a pure pass-through."""

    def __call__(self, x, mask=None):
        return x


class Concat:
    """Class form of :func:`concat_func` (reference utils.py:189-233).
    ``supports_masking`` is accepted for signature parity; mask
    propagation is the caller's job in this framework."""

    def __init__(self, axis=-1, supports_masking=True):
        self.axis = axis
        self.supports_masking = supports_masking

    def __call__(self, inputs):
        return concat_func(inputs, axis=self.axis)


class Hash:
    """Hash layer (reference utils.py:41-121): hashes values into
    [0, num_buckets) — or [1, num_buckets) with ``mask_zero`` (0 stays
    0) — or looks ids up from a two-column CSV ``vocabulary_path``.

    Dual-path like the reference's in-graph layer:

    - numpy arrays (host, BEFORE device transfer — strings live here):
      hashing.hash_array, bit-identical to TF's to_hash_bucket_fast
      (FarmHash64, tests/hashing_test.py);
    - jax arrays/tracers with INTEGER dtype (inside a jitted graph —
      custom models calling Hash()(ids) in __call__): the in-graph
      FarmHash64 kernel (ops/hash.py), bit-identical to the host path
      and exportable (serving artifacts hash raw keys this way).
    """

    def __init__(self, num_buckets, mask_zero=False, vocabulary_path=None,
                 default_value=0, **kwargs):
        self.num_buckets = num_buckets
        self.mask_zero = mask_zero
        self.vocabulary_path = vocabulary_path
        self.default_value = default_value

    def __call__(self, x, mask=None, **kwargs):
        import numpy as _np

        if not isinstance(x, _np.ndarray) and hasattr(x, "dtype") \
                and jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer) \
                and self.vocabulary_path is None:
            from ..ops.hash import device_hash_bucket

            return device_hash_bucket(x, self.num_buckets,
                                      mask_zero=self.mask_zero)
        from ..hashing import hash_array

        return hash_array(x, self.num_buckets, mask_zero=self.mask_zero,
                          vocabulary_path=self.vocabulary_path,
                          default_value=self.default_value)


def reduce_sum(input_tensor, axis=None, keep_dims=False, name=None):
    """TF-compat shim (reference utils.py:245-258)."""
    return jnp.sum(input_tensor, axis=axis, keepdims=keep_dims)


def reduce_mean(input_tensor, axis=None, keep_dims=False, name=None):
    """TF-compat shim (reference utils.py:260-273)."""
    return jnp.mean(input_tensor, axis=axis, keepdims=keep_dims)


def reduce_max(input_tensor, axis=None, keep_dims=False, name=None):
    """TF-compat shim (reference utils.py:275-288)."""
    return jnp.max(input_tensor, axis=axis, keepdims=keep_dims)


def div(x, y, name=None):
    """TF-compat shim (reference utils.py:290-301)."""
    return x / y
