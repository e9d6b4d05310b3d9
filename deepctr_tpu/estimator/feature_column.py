"""Estimator-tier feature-column glue (reference
estimator/feature_column.py:7-52).

The reference module adapts native ``tf.feature_column`` objects into the
estimator model bodies (``linear_model`` via TF graph collections,
``input_from_feature_columns`` via ``input_layer``). Here the same job is
done by the migration shim (deepctr_tpu/feature_column.py — the
``embedding_column``/``numeric_column`` factories whose outputs every
estimator factory converts with ``to_feature_columns``) plus the
framework's functional funnel, so this module is thin:

- ``is_embedding`` — predicate over shim columns (reference :47-52).
- ``input_from_feature_columns`` / ``get_linear_logit`` — the framework
  versions (flax-context functions); estimator model bodies here are the
  same flax modules the Keras tier uses (estimator/models.py), so the
  reference's separate graph-mode implementations have no equivalent and
  the one funnel serves both tiers.
- ``linear_model`` — reference :8-13 delegates to
  ``tf.feature_column.linear_model``; the equivalent wide tower over shim
  columns is ``get_linear_logit`` after ``to_feature_columns``.
"""
from __future__ import annotations

from ..feature_column import (  # noqa: F401
    EmbeddingColumn,
    to_feature_columns,
)
from ..inputs import get_linear_logit as _get_linear_logit
from ..inputs import input_from_feature_columns as _input_from_feature_columns


def get_linear_logit(features, linear_feature_columns, l2_reg_linear=0):
    """Estimator-tier contract (reference estimator/feature_column.py:15-27):
    ``l2_reg_linear`` keyword, tf.feature_column-style columns accepted."""
    return _get_linear_logit(
        features, to_feature_columns(linear_feature_columns),
        l2_reg=l2_reg_linear)


def input_from_feature_columns(features, feature_columns, l2_reg_embedding=0.0):
    """Estimator-tier contract (reference estimator/feature_column.py:30-44):
    ``l2_reg_embedding`` keyword, tf.feature_column-style columns accepted,
    returns (sparse_emb_list, dense_value_list)."""
    return _input_from_feature_columns(
        features, to_feature_columns(feature_columns), l2_reg_embedding)


def is_embedding(feature_column):
    """True for the shim's ``embedding_column`` output (reference
    estimator/feature_column.py:47-52 checks TF's EmbeddingColumn)."""
    return isinstance(feature_column, EmbeddingColumn)


def linear_model(features, linear_feature_columns):
    """Wide/linear logits over estimator-shim columns (reference
    estimator/feature_column.py:8-13). Must run inside a flax module
    context, like every functional-API entry point."""
    cols = to_feature_columns(linear_feature_columns)
    return get_linear_logit(features, cols)


__all__ = ["is_embedding", "linear_model", "get_linear_logit",
           "input_from_feature_columns", "to_feature_columns"]
