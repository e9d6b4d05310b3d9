"""Feature specs and the feature-column compiler.

TPU-native re-design of the reference feature-column layer
(see /root/reference/deepctr/feature_column.py:34-233 for the behavior contract):

- ``SparseFeat`` / ``VarLenSparseFeat`` / ``DenseFeat`` are frozen dataclasses
  (immutable, hashable, picklable) describing the feature schema.
- ``build_input_schema`` compiles a spec list into a static schema
  (name -> shape/dtype) used to validate and canonicalize host batches.
- Unlike the reference (which materializes Keras ``Input`` tensors), the
  compiled schema here is *pure metadata*: batches are plain dicts of arrays
  (a JAX pytree), so everything stays jit/pjit friendly with static shapes.

Initializers are declarative specs (tuples) rather than stateful objects so
feature columns remain hashable and serializable.
"""
from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Callable, Optional, Tuple

import numpy as np

DEFAULT_GROUP_NAME = "default_group"

# Declarative initializer specs: (kind, *args). Resolved in inputs.py.
#   ('normal', mean, stddev)   -> scaled normal
#   ('zeros',)                 -> zeros
#   ('glorot_normal',)         -> glorot normal
DEFAULT_EMBEDDING_INIT = ("normal", 0.0, 1e-4)


def _is_string_dtype(dtype) -> bool:
    if dtype is None:
        return False
    s = str(dtype)
    return s in ("string", "str", "object", "<U", "bytes") or s.startswith("<U")


@dataclasses.dataclass(frozen=True)
class SparseFeat:
    """Categorical feature embedded into a dense vector.

    Mirrors reference semantics (feature_column.py:34-57): ``embedding_dim="auto"``
    resolves to ``6 * vocab**0.25``; ``embedding_name`` defaults to ``name`` and
    enables shared tables; string-dtype features require ``use_hash=True``.
    """

    name: str
    vocabulary_size: int
    embedding_dim: int = 4
    use_hash: bool = False
    vocabulary_path: Optional[str] = None
    dtype: str = "int32"
    embeddings_initializer: object = None
    embedding_name: Optional[str] = None
    group_name: str = DEFAULT_GROUP_NAME
    trainable: bool = True

    def __post_init__(self):
        if self.embedding_dim == "auto":
            object.__setattr__(self, "embedding_dim", 6 * int(pow(self.vocabulary_size, 0.25)))
        if self.embeddings_initializer is None:
            object.__setattr__(self, "embeddings_initializer", DEFAULT_EMBEDDING_INIT)
        if self.embedding_name is None:
            object.__setattr__(self, "embedding_name", self.name)
        if _is_string_dtype(self.dtype) and not self.use_hash:
            raise ValueError(
                "SparseFeat(name='{}', dtype='string') requires use_hash=True "
                "so string ids can be converted before embedding lookup.".format(self.name)
            )

    def _replace(self, **kw) -> "SparseFeat":
        return dataclasses.replace(self, **kw)

    def __hash__(self):
        return hash(self.name)


@dataclasses.dataclass(frozen=True)
class VarLenSparseFeat:
    """Variable-length (padded) sequence of categorical ids.

    ``combiner`` in {sum, mean, max}; optional ``weight_name`` adds a per-step
    weight input of shape (maxlen, 1); optional ``length_name`` adds an explicit
    valid-length input of shape (1,). Reference: feature_column.py:60-109.
    """

    sparsefeat: SparseFeat
    maxlen: int
    combiner: str = "mean"
    length_name: Optional[str] = None
    weight_name: Optional[str] = None
    weight_norm: bool = True

    # --- passthrough properties mirroring the reference API ---
    @property
    def name(self):
        return self.sparsefeat.name

    @property
    def vocabulary_size(self):
        return self.sparsefeat.vocabulary_size

    @property
    def embedding_dim(self):
        return self.sparsefeat.embedding_dim

    @property
    def use_hash(self):
        return self.sparsefeat.use_hash

    @property
    def vocabulary_path(self):
        return self.sparsefeat.vocabulary_path

    @property
    def dtype(self):
        return self.sparsefeat.dtype

    @property
    def embeddings_initializer(self):
        return self.sparsefeat.embeddings_initializer

    @property
    def embedding_name(self):
        return self.sparsefeat.embedding_name

    @property
    def group_name(self):
        return self.sparsefeat.group_name

    @property
    def trainable(self):
        return self.sparsefeat.trainable

    def _replace(self, **kw) -> "VarLenSparseFeat":
        return dataclasses.replace(self, **kw)

    def __hash__(self):
        return hash(self.name)


@dataclasses.dataclass(frozen=True)
class DenseFeat:
    """Dense numeric feature of fixed ``dimension``.

    ``transform_fn`` (optional) is applied inside the traced forward pass,
    e.g. ``lambda x: (x - 3.0) / 4.2``. Reference: feature_column.py:112-129.
    """

    name: str
    dimension: int = 1
    dtype: str = "float32"
    transform_fn: Optional[Callable] = None

    def _replace(self, **kw) -> "DenseFeat":
        return dataclasses.replace(self, **kw)

    def __hash__(self):
        return hash(self.name)


@dataclasses.dataclass(frozen=True)
class InputSpec:
    """Static schema entry for one host input array (excluding batch dim)."""

    shape: Tuple[int, ...]
    dtype: str
    kind: str  # 'sparse' | 'dense' | 'varlen' | 'weight' | 'length'


def build_input_schema(feature_columns, prefix="") -> "OrderedDict[str, InputSpec]":
    """Compile feature columns into a static input schema.

    Equivalent role to reference ``build_input_features`` (feature_column.py:145-168)
    but returns pure metadata instead of Keras Input tensors.
    """
    schema = OrderedDict()
    for fc in feature_columns:
        if isinstance(fc, SparseFeat):
            schema[fc.name] = InputSpec((1,), "int32", "sparse")
        elif isinstance(fc, DenseFeat):
            schema[fc.name] = InputSpec((fc.dimension,), "float32", "dense")
        elif isinstance(fc, VarLenSparseFeat):
            schema[fc.name] = InputSpec((fc.maxlen,), "int32", "varlen")
            if fc.weight_name is not None:
                schema[fc.weight_name] = InputSpec((fc.maxlen, 1), "float32", "weight")
            if fc.length_name is not None:
                schema[fc.length_name] = InputSpec((1,), "int32", "length")
        else:
            raise TypeError("Invalid feature column type,got {}".format(type(fc)))
    return schema


def get_feature_names(feature_columns):
    """Ordered list of model input names (reference feature_column.py:140-142)."""
    return list(build_input_schema(feature_columns).keys())


def split_columns(feature_columns):
    """Partition columns into (sparse, varlen, dense) preserving order."""
    sparse = [fc for fc in (feature_columns or []) if isinstance(fc, SparseFeat)]
    varlen = [fc for fc in (feature_columns or []) if isinstance(fc, VarLenSparseFeat)]
    dense = [fc for fc in (feature_columns or []) if isinstance(fc, DenseFeat)]
    return sparse, varlen, dense


def make_linear_columns(feature_columns):
    """Rebuild columns with embedding_dim=1 and zeros init for the wide/linear
    tower (reference get_linear_logit, feature_column.py:173-181)."""
    out = []
    for fc in feature_columns:
        if isinstance(fc, SparseFeat):
            out.append(fc._replace(embedding_dim=1, embeddings_initializer=("zeros",)))
        elif isinstance(fc, VarLenSparseFeat):
            out.append(
                fc._replace(
                    sparsefeat=fc.sparsefeat._replace(
                        embedding_dim=1, embeddings_initializer=("zeros",)
                    )
                )
            )
        else:
            out.append(fc)
    return out


def canonicalize_batch(x, feature_columns, skip_hash=()):
    """Convert a user-supplied input dict (or list) of numpy arrays into the
    canonical dict-of-arrays batch the models consume.

    - casts dtypes, reshapes (B,) -> (B, 1) where the schema expects 2D
    - applies host-side hashing for ``use_hash`` features (TPU has no string
      ops; see hashing.py — parity with reference layers/utils.py:89-112)
    - ``skip_hash``: feature names whose hashing happens IN-GRAPH instead
      (serving artifacts exported with in-graph hashing, serving.py) —
      they pass through as raw integer keys
    """
    from . import hashing as _hashing

    schema = build_input_schema(feature_columns)
    if isinstance(x, (list, tuple)):
        names = list(schema.keys())
        if len(x) != len(names):
            raise ValueError(
                "Expected {} input arrays, got {}".format(len(names), len(x))
            )
        x = dict(zip(names, x))

    hash_cols = {}
    for fc in feature_columns:
        if isinstance(fc, (SparseFeat, VarLenSparseFeat)) and fc.use_hash:
            hash_cols[fc.name] = fc

    out = {}
    for name, spec in schema.items():
        if name not in x:
            raise ValueError("Missing input feature '{}'".format(name))
        arr = np.asarray(x[name])
        if name in hash_cols and name not in skip_hash:
            fc = hash_cols[name]
            arr = _hashing.hash_array(
                arr,
                fc.vocabulary_size,
                mask_zero=(spec.kind == "varlen"),
                vocabulary_path=fc.vocabulary_path,
            )
        want_ndim = 1 + len(spec.shape)
        if arr.ndim == want_ndim - 1:
            arr = arr.reshape(arr.shape + (1,) * (want_ndim - arr.ndim))
        elif (arr.ndim == want_ndim + 1 and arr.shape[-1] == 2
              and name in skip_hash):
            # wide [lo, hi] int32 planes for in-graph 64-bit hashing of a
            # VARLEN feature (serving.py hash_in_graph="wide"): (B, T, 2)
            # where the schema says (B, T) — the artifact hashes it down
            pass
        elif arr.ndim != want_ndim:
            raise ValueError(
                "Feature '{}': expected rank {} (incl. batch), got shape {}".format(
                    name, want_ndim, arr.shape
                )
            )
        target_dtype = np.int32 if spec.dtype == "int32" else np.float32
        out[name] = np.ascontiguousarray(arr, dtype=target_dtype)
    return out


def mergeDict(a, b):
    """Merge two dict-of-lists by extending per key (reference
    inputs.py:175-181; exported via feature_column). Kept for drop-in
    parity with code that grouped embedding lookups this way."""
    from collections import defaultdict

    c = defaultdict(list)
    for k, v in a.items():
        c[k].extend(v)
    for k, v in b.items():
        c[k].extend(v)
    return c
