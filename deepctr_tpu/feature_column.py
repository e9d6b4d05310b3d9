"""``deepctr_tpu.feature_column`` — reference-module-name alias + a
``tf.feature_column`` migration shim.

Two audiences:

1. Reference users who import ``from deepctr.feature_column import
   SparseFeat, ...`` (ref feature_column.py) — the framework specs are
   re-exported here under the same module name, with
   ``build_input_features`` aliasing the schema compiler.

2. Reference *estimator* users, whose code builds native
   ``tf.feature_column`` objects (ref estimator/feature_column.py:7-45
   consumes them via ``tf.feature_column.linear_model`` /
   ``input_layer``; examples/run_estimator_pandas_classification.py).
   The same factory functions exist here and produce lightweight column
   descriptions that every model / estimator factory converts to the
   framework's ``SparseFeat`` / ``DenseFeat`` specs on entry
   (``to_feature_columns``), preserving the reference semantics:

   - ``embedding_column(categorical, dim)``  -> embedding lookup
     (``input_layer``)                       == ``SparseFeat(dim=dim)``
   - bare categorical column in the linear list -> one weight per bucket
     (``linear_model``)                      == dim-1 zeros-init linear
     embedding (features.make_linear_columns, ref feature_column.py:173-181)
   - ``numeric_column``                      == ``DenseFeat`` (+optional
     ``normalizer_fn`` as ``transform_fn``)
   - ``categorical_column_with_hash_bucket`` == ``use_hash=True`` host
     hashing (hashing.py — TPUs have no string ops)
   - ``categorical_column_with_vocabulary_file`` == ``vocabulary_path``
     lookup semantics
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

from .features import (  # noqa: F401  (re-exports: reference module parity)
    DEFAULT_GROUP_NAME,
    DenseFeat,
    SparseFeat,
    VarLenSparseFeat,
    build_input_schema,
    get_feature_names,
    make_linear_columns,
    mergeDict,
    split_columns,
)

# reference name for the schema builder (feature_column.py:140-168)
build_input_features = build_input_schema


# --------------------------------------------------------------------------
# tf.feature_column-shaped factories (the subset the reference estimator
# surface exercises; see module docstring). These are descriptions only —
# conversion to framework specs happens in to_feature_columns().
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class IdentityCategoricalColumn:
    key: str
    num_buckets: int
    default_value: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class HashedCategoricalColumn:
    key: str
    hash_bucket_size: int
    dtype: str = "string"


@dataclasses.dataclass(frozen=True)
class VocabularyFileCategoricalColumn:
    key: str
    vocabulary_file: str
    vocabulary_size: Optional[int] = None
    dtype: str = "string"
    default_value: Optional[int] = None
    num_oov_buckets: int = 0


@dataclasses.dataclass(frozen=True)
class NumericColumn:
    key: str
    shape: Tuple[int, ...] = (1,)
    default_value: Optional[float] = None
    dtype: str = "float32"
    normalizer_fn: Optional[Callable] = None


@dataclasses.dataclass(frozen=True)
class EmbeddingColumn:
    categorical_column: object
    dimension: int
    combiner: str = "mean"
    initializer: object = None
    max_norm: Optional[float] = None
    trainable: bool = True


_CATEGORICAL_TYPES = (IdentityCategoricalColumn, HashedCategoricalColumn,
                      VocabularyFileCategoricalColumn)
COMPAT_COLUMN_TYPES = _CATEGORICAL_TYPES + (NumericColumn, EmbeddingColumn)


def categorical_column_with_identity(key, num_buckets, default_value=None):
    """tf.feature_column.categorical_column_with_identity."""
    return IdentityCategoricalColumn(key, int(num_buckets), default_value)


def categorical_column_with_hash_bucket(key, hash_bucket_size, dtype="string"):
    """tf.feature_column.categorical_column_with_hash_bucket — hashing
    happens on host at canonicalize_batch time (hashing.py, FarmHash64
    bit-parity with tf.strings.to_hash_bucket_fast)."""
    return HashedCategoricalColumn(key, int(hash_bucket_size), str(dtype))


def categorical_column_with_vocabulary_file(key, vocabulary_file,
                                            vocabulary_size=None,
                                            dtype="string",
                                            default_value=None,
                                            num_oov_buckets=0):
    """tf.feature_column.categorical_column_with_vocabulary_file — maps to
    the framework's ``vocabulary_path`` lookup (features.py SparseFeat)."""
    return VocabularyFileCategoricalColumn(
        key, vocabulary_file, vocabulary_size, str(dtype), default_value,
        int(num_oov_buckets))


def categorical_column_with_vocabulary_list(key, vocabulary_list, dtype=None,
                                            default_value=-1,
                                            num_oov_buckets=0):
    raise NotImplementedError(
        "categorical_column_with_vocabulary_list: write the vocabulary to a "
        "file and use categorical_column_with_vocabulary_file(...), or "
        "integer-encode on host (sklearn LabelEncoder, as the reference "
        "examples do) and use categorical_column_with_identity(...).")


def numeric_column(key, shape=(1,), default_value=None, dtype="float32",
                   normalizer_fn=None):
    """tf.feature_column.numeric_column."""
    if isinstance(shape, int):
        shape = (shape,)
    return NumericColumn(key, tuple(int(s) for s in shape), default_value,
                         str(dtype), normalizer_fn)


def embedding_column(categorical_column, dimension, combiner="mean",
                     initializer=None, ckpt_to_load_from=None,
                     tensor_name_in_ckpt=None, max_norm=None, trainable=True):
    """tf.feature_column.embedding_column."""
    if not isinstance(categorical_column, _CATEGORICAL_TYPES):
        raise ValueError(
            "embedding_column expects a categorical column from this "
            "module, got %r" % (categorical_column,))
    if ckpt_to_load_from is not None or tensor_name_in_ckpt is not None:
        raise NotImplementedError(
            "embedding_column(ckpt_to_load_from=...): load weights through "
            "the framework checkpoint API instead (save_model/load_model).")
    mod = type(initializer).__module__ or ""
    if mod.startswith(("tensorflow", "keras", "tf_keras")):
        # TF initializers are callable but with (shape, dtype) convention —
        # they would fail deep inside jit; fail here with the fix instead.
        raise ValueError(
            "embedding_column(initializer=%r): TF initializer objects are "
            "not supported. Pass a declarative spec such as "
            "('truncated_normal', mean, stddev) / ('normal', mean, stddev) /"
            " ('zeros',), or a JAX-style callable (key, shape, dtype) -> "
            "array. Default (None) uses the framework embedding init "
            "(RandomNormal stddev=1e-4, the reference Keras tier's "
            "default)." % (initializer,))
    # Deliberate deviation: None keeps the framework default
    # (RandomNormal 1e-4 — the reference's *Keras-tier* embedding init,
    # feature_column.py:46) rather than tf.feature_column's
    # truncated_normal(1/sqrt(dim)), which measurably degrades
    # small-sample quality. Pass ('truncated_normal', 0.0,
    # dimension ** -0.5) to reproduce the TF estimator-tier init exactly.
    return EmbeddingColumn(categorical_column, int(dimension), combiner,
                           initializer, max_norm, bool(trainable))


# --------------------------------------------------------------------------
# conversion
# --------------------------------------------------------------------------

def _categorical_to_sparsefeat(cat, embedding_dim, initializer=None,
                               trainable=True):
    if isinstance(cat, IdentityCategoricalColumn):
        return SparseFeat(cat.key, cat.num_buckets,
                          embedding_dim=embedding_dim,
                          embeddings_initializer=initializer,
                          trainable=trainable)
    if isinstance(cat, HashedCategoricalColumn):
        return SparseFeat(cat.key, cat.hash_bucket_size,
                          embedding_dim=embedding_dim, use_hash=True,
                          dtype=cat.dtype,
                          embeddings_initializer=initializer,
                          trainable=trainable)
    if isinstance(cat, VocabularyFileCategoricalColumn):
        if cat.vocabulary_size is None:
            with open(cat.vocabulary_file) as f:
                vocab_size = sum(1 for _ in f)
        else:
            vocab_size = cat.vocabulary_size
        # row 0 is the framework's OOV/default row (hashing.py vocab path);
        # +1 mirrors the reference's mask_zero bucket shift
        return SparseFeat(cat.key, vocab_size + 1 + max(cat.num_oov_buckets, 0),
                          embedding_dim=embedding_dim, use_hash=True,
                          vocabulary_path=cat.vocabulary_file,
                          dtype=cat.dtype,
                          embeddings_initializer=initializer,
                          trainable=trainable)
    raise ValueError("Unsupported categorical column %r" % (cat,))


def is_compat_column(fc) -> bool:
    return isinstance(fc, COMPAT_COLUMN_TYPES)


def to_feature_columns(columns: Sequence) -> list:
    """Convert tf.feature_column-style descriptions to framework specs.

    Framework-native specs pass through unchanged, so mixed lists work.
    A *bare* categorical column becomes a dim-1 SparseFeat — in the
    reference's linear tower that is exactly ``linear_model``'s
    one-weight-per-bucket (and our LinearLogit re-embeds at dim 1
    regardless; features.make_linear_columns).
    """
    out = []
    for fc in columns:
        if isinstance(fc, EmbeddingColumn):
            out.append(_categorical_to_sparsefeat(
                fc.categorical_column, fc.dimension,
                initializer=fc.initializer, trainable=fc.trainable))
        elif isinstance(fc, _CATEGORICAL_TYPES):
            out.append(_categorical_to_sparsefeat(fc, 1))
        elif isinstance(fc, NumericColumn):
            dim = 1
            for s in fc.shape:
                dim *= s
            out.append(DenseFeat(fc.key, dim, dtype="float32",
                                 transform_fn=fc.normalizer_fn))
        else:
            out.append(fc)  # framework-native spec (or raises downstream)
    return out


def convert_if_compat(obj):
    """If ``obj`` is a list/tuple containing any compat column, return the
    converted list; otherwise return ``obj`` unchanged. The single hook
    every model factory runs its column arguments through
    (models/_common.register)."""
    if isinstance(obj, (list, tuple)) and any(is_compat_column(fc)
                                              for fc in obj):
        return to_feature_columns(obj)
    return obj



# Reference functional custom-model API: the reference re-exports these from
# deepctr.feature_column (they are defined across its feature_column.py and
# inputs.py); custom models import them from either module.
from .inputs import (  # noqa: F401,E402
    create_embedding_matrix,
    embedding_lookup,
    get_dense_input,
    get_linear_logit,
    get_varlen_pooling_list,
    input_from_feature_columns,
    varlen_embedding_lookup,
)
from .layers.utils import Linear, concat_func  # noqa: F401,E402

__all__ = [
    "DEFAULT_GROUP_NAME", "DenseFeat", "SparseFeat", "VarLenSparseFeat",
    "build_input_features", "build_input_schema", "get_feature_names",
    "make_linear_columns", "mergeDict", "split_columns",
    "categorical_column_with_identity", "categorical_column_with_hash_bucket",
    "categorical_column_with_vocabulary_file",
    "categorical_column_with_vocabulary_list", "numeric_column",
    "embedding_column", "to_feature_columns", "is_compat_column",
    "convert_if_compat",
    "create_embedding_matrix", "embedding_lookup", "get_dense_input",
    "get_linear_logit", "get_varlen_pooling_list",
    "input_from_feature_columns", "varlen_embedding_lookup", "Linear",
    "concat_func",
]
