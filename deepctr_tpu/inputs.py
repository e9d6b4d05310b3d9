"""Embedding engine: feature columns -> shared tables -> grouped lookups.

TPU-native replacement for the reference's per-feature Keras ``Embedding``
layers (deepctr/inputs.py:19-181):

- One parameter table per distinct ``embedding_name`` (shared-table dedup with
  compatibility checks, reference inputs.py:29-37,44-71).
- Lookups are ``jnp.take`` gathers — XLA lowers these to TPU dynamic-gathers;
  a fused multi-table Pallas path lives in ops/ for the sharded case.
- Varlen features pool with *explicit* masks (ids != 0 under ``seq_mask_zero``,
  or a ``length_name`` input), replacing Keras mask propagation.
- ``trainable=False`` tables are frozen with ``stop_gradient`` at lookup time.

``EmbeddingTables.__call__`` is the single funnel equivalent to the reference
``input_from_feature_columns`` (feature_column.py:213-233).
"""
from __future__ import annotations

from collections import OrderedDict, defaultdict
from itertools import chain
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .features import DenseFeat, SparseFeat, VarLenSparseFeat, split_columns
from .features import mergeDict  # noqa: F401  (reference inputs.py export)
from .layers.base import compute_dtype
from .layers.base import l2_reg as _l2_reg
from .layers.sequence import sequence_pooling, weighted_sequence
# Reference export parity: the reference inputs.py re-exports these layer
# classes and user code imports them from deepctr.inputs.
from .layers.sequence import (  # noqa: F401
    SequencePoolingLayer,
    WeightedSequenceLayer,
)
from .layers.utils import Hash  # noqa: F401

# Rows-collection key prefix for folded wide-tower lookups (so the sparse
# engine stores a feature's linear rows separately from its main rows).
LIN_ROWS_PREFIX = "linear~"


def resolve_initializer(spec):
    """Declarative initializer spec -> flax initializer callable."""
    if callable(spec):
        return spec
    if isinstance(spec, (tuple, list)):
        kind = spec[0]
        if kind == "normal":
            _, mean, stddev = spec
            def init(key, shape, dtype=jnp.float32):
                return mean + stddev * jax.random.normal(key, shape, dtype)
            return init
        if kind == "zeros":
            return nn.initializers.zeros_init()
        if kind == "glorot_normal":
            return nn.initializers.glorot_normal()
        if kind == "glorot_uniform":
            return nn.initializers.glorot_uniform()
        if kind == "truncated_normal":
            _, mean, stddev = spec
            def tn_init(key, shape, dtype=jnp.float32):
                return mean + stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
            return tn_init
    raise ValueError("Unknown initializer spec: {!r}".format(spec))


def build_embedding_plan(feature_columns):
    """Dedupe feature columns into a table plan {embedding_name: feat} with
    shared-table compatibility checks (reference inputs.py:29-37)."""
    sparse, varlen, _ = split_columns(feature_columns)
    plan = OrderedDict()
    for feat in chain(sparse, varlen):
        name = feat.embedding_name
        if name in plan:
            existing = plan[name]
            for attr in ("vocabulary_size", "embedding_dim", "trainable"):
                if getattr(existing, attr) != getattr(feat, attr):
                    raise ValueError(
                        "Feature columns with the same embedding_name must share the same "
                        "{}. embedding_name='{}' has {} and {}.".format(
                            attr, name, getattr(existing, attr), getattr(feat, attr)
                        )
                    )
            continue
        plan[name] = feat.sparsefeat if isinstance(feat, VarLenSparseFeat) else feat
    return plan


def fold_linear_split(linear_feature_columns, dnn_feature_columns):
    """(foldable, rest) split of the wide tower's columns for the linear fold.

    The wide/linear tower re-embeds every sparse feature with a dim-1
    zero-init table (reference get_linear_logit, feature_column.py:173-181).
    Looked up separately, those tables are the WORST possible TPU access
    pattern: 4-byte rows gathered/scattered at HBM-line granularity
    (profiled at ~half the DeepFM step). When a linear column targets a
    table that also exists in the deep tower's plan, its dim-1 weights can
    ride the deep row's gather for free: the funnel concatenates the
    ``(V, 1)`` linear param onto the ``(V, E)`` deep table in-trace and one
    gather serves both towers (EmbeddingTables.linear_values).

    Folding is all-or-nothing over the sparse/varlen linear columns so the
    wide tower's feature ORDER is preserved (IFM/DIFM's refine weight is
    positional). Dense columns always go to ``rest``.
    """
    plan = build_embedding_plan(dnn_feature_columns)
    foldable, rest = [], []
    for fc in linear_feature_columns:
        if isinstance(fc, DenseFeat):
            rest.append(fc)
            continue
        feat = fc.sparsefeat if isinstance(fc, VarLenSparseFeat) else fc
        host = plan.get(feat.embedding_name)
        if (host is not None
                and host.vocabulary_size == feat.vocabulary_size
                and host.trainable == feat.trainable):
            foldable.append(fc)
        else:
            foldable = None
            break
    if foldable is None or not foldable:
        return (), tuple(linear_feature_columns)
    return tuple(foldable), tuple(rest)


def get_dense_input(features, feature_columns):
    """Dense values with optional transform_fn (reference inputs.py:161-172)."""
    _, _, dense_cols = split_columns(feature_columns)
    out = []
    for fc in dense_cols:
        v = features[fc.name]
        if fc.transform_fn is not None:
            v = fc.transform_fn(v)
        out.append(v)
    return out


def merge_group_dicts(a, b):
    c = defaultdict(list)
    for k, v in a.items():
        c[k].extend(v)
    for k, v in b.items():
        c[k].extend(v)
    return c


class EmbeddingTables(nn.Module):
    """Shared embedding tables + the lookup/pooling funnel for one tower.

    ``feature_columns`` may mix SparseFeat / VarLenSparseFeat / DenseFeat; the
    dense ones only flow through ``__call__``'s dense output list.
    """

    feature_columns: Tuple
    l2_reg: float = 0.0
    prefix: str = "sparse"
    seq_mask_zero: bool = True
    # Folded wide-tower columns (fold_linear_split): each gets a (V, 1)
    # zero-init param "emb_linear_<table>" that rides the deep table's
    # gather (concatenated in-trace, one gather serves both towers).
    linear_columns: Tuple = ()
    linear_l2: float = 0.0

    def setup(self):
        plan = build_embedding_plan(self.feature_columns)
        tables = {}
        for name, feat in plan.items():
            tables[name] = self.param(
                "emb_" + name,
                resolve_initializer(feat.embeddings_initializer),
                (feat.vocabulary_size, feat.embedding_dim),
            )
        self._plan = plan
        self.tables = tables
        lin_tables = {}
        if self.linear_columns:
            from .features import make_linear_columns

            lin_plan = build_embedding_plan(
                tuple(make_linear_columns(self.linear_columns)))
            for name, feat in lin_plan.items():
                # dim-1, zeros init (reference feature_column.py:176-181);
                # the "emb_linear_" prefix keeps it in the embedding
                # optimizer/bf16/sharding groups (prefix "emb_") AND in the
                # estimator's FTRL group (path contains "linear").
                lin_tables[name] = self.param(
                    "emb_linear_" + name,
                    resolve_initializer(feat.embeddings_initializer),
                    (feat.vocabulary_size, feat.embedding_dim),
                )
        self._lin_tables = lin_tables

    def _table_raw(self, feat):
        t = self.tables[feat.embedding_name]
        if not feat.trainable:
            t = jax.lax.stop_gradient(t)
        return t

    def __getitem__(self, embedding_name):
        """Dict-style access (reference ``embedding_dict[name](ids)``,
        inputs.py:74-89): returns a row-lookup callable for one shared
        table, so custom-model code written against the reference's
        dict-of-Embedding container ports verbatim. Routes through
        ``_table`` (the 'direct' gather marker keeps the sparse-update
        engine's dense-grad bookkeeping correct)."""
        feat = self._plan[embedding_name]

        def lookup_rows(ids):
            from .parallel.sharded_lookup import routed_take

            ids = jnp.asarray(ids).astype(jnp.int32)
            return routed_take(self._table(feat), ids,
                               overflow_sink=self._overflow_sink())

        return lookup_rows

    def _full_table(self, feat):
        """Deep table with the folded wide-tower column appended (the fold:
        one physical gather serves both towers; XLA CSE merges the identical
        takes issued by ``_rows`` and ``linear_values``)."""
        t = self.tables[feat.embedding_name]
        lin = self._lin_tables.get(feat.embedding_name)
        if lin is not None:
            t = jnp.concatenate([t, lin.astype(t.dtype)], axis=1)
        if not feat.trainable:
            t = jax.lax.stop_gradient(t)
        return t

    def _table(self, feat):
        """Direct table access (model code bypassing the lookup funnel, e.g.
        DSIN's session gathers). In planning mode this records a 'direct'
        marker so the sparse-update engine keeps such tables on the dense
        gradient path (their grads cannot be hoisted)."""
        if self.is_mutable_collection("gather_plan"):
            self.sow(
                "gather_plan", "__direct__|" + feat.embedding_name,
                jnp.zeros((2,), jnp.float32),
                init_fn=lambda: jnp.zeros((2,), jnp.float32),
                reduce_fn=lambda a, b: b,
            )
        return self._table_raw(feat)

    def _overflow_sink(self):
        """Where the a2a capacity-drop counter lands: the 'lookup_stats'
        collection (when mutable — the trainer requests it whenever an
        explicit lookup_capacity is configured). reduce_fn adds, so the
        counter accumulates across features AND across steps (total ids
        silently zero-dropped since training began)."""
        if not self.is_mutable_collection("lookup_stats"):
            return None

        def sink(n):
            self.sow("lookup_stats", "a2a_overflow", n,
                     init_fn=lambda: jnp.zeros((), jnp.int32),
                     reduce_fn=lambda a, b: a + b)

        return sink

    def _take_full(self, feat, fc_name, ids, cache):
        """One full-width gather per (table, ids) pair per funnel call.

        ``cache`` (a per-call dict) guarantees the deep tower and the folded
        wide tower consume slices of a SINGLE take op in the jaxpr — relying
        on HLO CSE is not enough: autodiff transposes each take separately,
        so two takes become two backward scatter-adds (measured +10ms/step
        at the criteo shape) even though the forward gathers dedupe.

        Under an active ``sharded_lookup_scope`` (compile(sharded_lookup=
        "auto"|"a2a"|"psum") with a mesh) the gather routes through the
        explicit shard_map exchange for row-sharded tables
        (parallel/sharded_lookup.py) instead of jnp.take + auto-SPMD.
        """
        key = (feat.embedding_name, fc_name, ids.ndim)
        if cache is not None and key in cache:
            return cache[key]
        from .parallel.sharded_lookup import routed_take

        full = routed_take(self._full_table(feat), ids,
                           overflow_sink=self._overflow_sink())
        if cache is not None:
            cache[key] = full
        return full

    def _rows(self, feat, ids, cache=None):
        """Embedding rows for one feature.

        Fast path: when the trainer supplies a 'gathered' collection (the
        sparse-update engine, training/sparse_embedding.py), rows come from
        there — gathers were hoisted out of the loss so table gradients stay
        row-sparse. In planning mode ('gather_plan' mutable) the lookup is
        recorded so the trainer can learn (module path, feature) -> table.
        Default: plain jnp.take (XLA dynamic-gather).
        """
        key = feat.name
        if self.is_mutable_collection("gather_plan"):
            kind = 1 if isinstance(feat, VarLenSparseFeat) else 0
            meta = jnp.asarray([kind, self.l2_reg], jnp.float32)
            self.sow(
                "gather_plan", key + "|" + feat.embedding_name, meta,
                init_fn=lambda: meta,
                reduce_fn=lambda a, b: b,
            )
        if self.has_variable("gathered", key):
            rows = self.get_variable("gathered", key)
            if not feat.trainable:
                rows = jax.lax.stop_gradient(rows)
            # lazy (touched-rows) l2 happens ONCE per plan entry in the
            # sparse train step, not here — a feature may be looked up
            # several times per forward pass (e.g. DIN query + dnn lists)
            cd = compute_dtype()
            if rows.dtype != cd:
                rows = rows.astype(cd)  # grads transpose back through the cast
            return rows
        base = feat.sparsefeat if isinstance(feat, VarLenSparseFeat) else feat
        rows = self._take_full(base, feat.name, ids, cache)
        if base.embedding_name in self._lin_tables:
            rows = rows[..., : base.embedding_dim]  # folded col is the tail
        cd = compute_dtype()
        if rows.dtype != cd:
            # table storage dtype != activation dtype (e.g. bf16 tables with
            # f32 compute, or f32 tables with compute_dtype="bfloat16")
            rows = rows.astype(cd)
        return rows

    def _reg_all(self):
        # Full-table l2, matching Keras embeddings_regularizer (inputs.py:22).
        # Tables served from the 'gathered' collection (sparse-update mode)
        # are skipped — lazy per-row reg happens in _rows instead.
        if self.l2_reg:
            sparse_cols, varlen_cols, _ = split_columns(self.feature_columns)
            gathered_tables = {
                fc.embedding_name
                for fc in chain(sparse_cols, varlen_cols)
                if self.has_variable("gathered", fc.name)
            }
            dense_reg = [self.tables[n] for n in self._plan if n not in gathered_tables]
            if dense_reg:
                _l2_reg(self, self.l2_reg, *dense_reg)
        if self.linear_l2 and self._lin_tables:
            gathered_lin = {
                (fc.sparsefeat if isinstance(fc, VarLenSparseFeat) else fc).embedding_name
                for fc in self.linear_columns
                if self.has_variable("gathered", LIN_ROWS_PREFIX + fc.name)
            }
            lin_reg = [t for n, t in self._lin_tables.items() if n not in gathered_lin]
            if lin_reg:
                _l2_reg(self, self.linear_l2, *lin_reg)

    def linear_values(self, features, cache=None):
        """Folded wide-tower values (B, 1, F) for ``linear_columns`` (order
        preserved), or None when nothing is folded.

        Dense path: each value is the tail column of the SAME full-width
        gather `_rows` issues for the deep tower — via the shared per-call
        ``cache``, so the jaxpr holds ONE take per (table, ids) pair (HLO
        CSE alone is not enough; see ``_take_full``) — the dim-1 tables'
        pathological 4-byte-row gathers/scatters disappear. Sparse-engine
        path: the linear param is recorded/served as its own plan entry
        (rows key ``linear~<name>``) so hoisting, lazy l2 and row-wise
        Adagrad treat it exactly like the unfolded dim-1 table.
        """
        if not self.linear_columns:
            return None
        out = []
        for fc in self.linear_columns:
            varlen = isinstance(fc, VarLenSparseFeat)
            base = fc.sparsefeat if varlen else fc
            deep = self._plan[base.embedding_name]
            key = LIN_ROWS_PREFIX + fc.name
            ids = features[fc.name].astype(jnp.int32)
            if not varlen:
                ids = ids.reshape(-1)
            if self.is_mutable_collection("gather_plan"):
                kind = 1 if varlen else 0
                meta = jnp.asarray([kind, self.linear_l2], jnp.float32)
                self.sow(
                    "gather_plan",
                    key + "|linear_" + base.embedding_name, meta,
                    init_fn=lambda meta=meta: meta,
                    reduce_fn=lambda a, b: b,
                )
            if self.has_variable("gathered", key):
                lin = self.get_variable("gathered", key)
                if not base.trainable:
                    lin = jax.lax.stop_gradient(lin)
            elif self.is_mutable_collection("gather_plan"):
                # planning pass: gather from the standalone param so the
                # recorded entry matches what the engine will hoist
                tbl = self._lin_tables[base.embedding_name]
                if not base.trainable:
                    tbl = jax.lax.stop_gradient(tbl)
                lin = jnp.take(tbl, ids, axis=0, mode="clip")
            else:
                # folded col is the tail of the deep table's full-width
                # gather; the slice offset is the DEEP dim (the linear
                # column's declared dim is irrelevant — it re-embeds at 1)
                full = self._take_full(deep, fc.name, ids, cache)
                lin = full[..., deep.embedding_dim:]
            if lin.dtype != jnp.float32:
                # wide-tower values stay f32: they sum straight into the
                # logit and are tiny (dim-1)
                lin = lin.astype(jnp.float32)
            if varlen:
                mask = self.varlen_mask(features, fc)
                if fc.weight_name is not None:
                    lin = weighted_sequence(
                        lin, features[fc.weight_name], mask=mask,
                        weight_normalization=fc.weight_norm,
                    )
                vec = sequence_pooling(lin, fc.combiner, mask=mask)
            else:
                vec = lin[:, None, :]
            out.append(vec)  # (B, 1, 1)
        return jnp.concatenate(out, axis=-1)

    def lookup(self, features, sparse_cols, return_feat_list=(), to_list=False,
               cache=None):
        """Grouped sparse lookups (reference embedding_lookup, inputs.py:101-117).

        Each output is (B, 1, E). ``use_hash`` ids were hashed on host.
        """
        group = defaultdict(list)
        for fc in sparse_cols:
            if len(return_feat_list) == 0 or fc.name in return_feat_list:
                ids = features[fc.name].astype(jnp.int32).reshape(-1)
                # mode="clip" in _rows: out-of-vocab ids clamp, never NaN
                vec = self._rows(fc, ids, cache=cache)[:, None, :]
                group[fc.group_name].append(vec)
        if to_list:
            return list(chain.from_iterable(group.values()))
        return group

    def varlen_lookup(self, features, varlen_cols, return_feat_list=(), to_list=False,
                      cache=None):
        """Raw (B, T, E) sequence embeddings (reference inputs.py:120-130)."""
        out = OrderedDict()
        for fc in varlen_cols:
            if len(return_feat_list) == 0 or fc.name in return_feat_list:
                ids = features[fc.name].astype(jnp.int32)
                out[fc.name] = self._rows(fc, ids, cache=cache)
        if to_list:
            return list(out.values())
        return out

    def varlen_mask(self, features, fc):
        """Explicit (B, T) mask for a varlen feature: from length_name when
        present, else ids != 0 under seq_mask_zero (Keras mask_zero parity)."""
        ids = features[fc.name].astype(jnp.int32)
        if fc.length_name is not None:
            from .layers.base import sequence_mask

            return sequence_mask(features[fc.length_name], fc.maxlen, jnp.bool_)
        if self.seq_mask_zero:
            return ids != 0
        return jnp.ones_like(ids, dtype=jnp.bool_)

    def _fused_pool_eligible(self, fc):
        """True when this varlen feature can take the Pallas fused
        gather+pool kernel (ops/embedding.py): kernel enabled, plain
        sum/mean/max combiner, supported table shape, and the rows are NOT
        being served/planned by the sparse-update engine (whose hoisted
        gathers must stay the single lookup funnel)."""
        from .ops import embedding as fused

        if not fused.fused_pool_enabled():
            return False
        if self.is_mutable_collection("gather_plan"):
            return False
        if self.has_variable("gathered", fc.name):
            return False
        feat = fc.sparsefeat
        return fused.fused_pool_supported(
            feat.vocabulary_size, feat.embedding_dim, fc.combiner,
            fc.weight_name is not None, maxlen=fc.maxlen,
        )

    def pool_varlen(self, features, varlen_cols, to_list=False, cache=None):
        """Pooled (B, 1, E) per varlen feature, grouped (reference
        get_varlen_pooling_list, inputs.py:133-158). Eligible features run
        the fused Pallas gather+pool (the (B, T, E) intermediate never
        exists); the rest gather then reduce."""
        from .ops import embedding as fused

        group = defaultdict(list)
        fused_cols = [fc for fc in varlen_cols if self._fused_pool_eligible(fc)]
        std_cols = [fc for fc in varlen_cols if fc not in fused_cols]
        seq_embeds = self.varlen_lookup(features, std_cols, cache=cache)
        for fc in varlen_cols:
            mask = self.varlen_mask(features, fc)
            if fc in fused_cols:
                ids = features[fc.name].astype(jnp.int32)
                pooled = fused.fused_gather_pool(
                    self._table_raw(fc.sparsefeat), ids, mask,
                    combiner=fc.combiner,
                    interpret=fused.fused_pool_interpret(),
                )
                if pooled.dtype != jnp.float32:
                    pooled = pooled.astype(jnp.float32)
                vec = pooled[:, None, :]
            else:
                seq = seq_embeds[fc.name]
                if fc.weight_name is not None:
                    seq = weighted_sequence(
                        seq, features[fc.weight_name], mask=mask,
                        weight_normalization=fc.weight_norm,
                    )
                vec = sequence_pooling(seq, fc.combiner, mask=mask)
            group[fc.group_name].append(vec)
        if to_list:
            return list(chain.from_iterable(group.values()))
        return group

    def __call__(self, features, support_dense=True, support_group=False,
                 return_linear=False):
        """The input_from_feature_columns funnel (feature_column.py:213-233).

        Returns (group_embedding_dict | flat list, dense_value_list)
        — plus the folded wide-tower values (``linear_values``) as a third
        element when ``return_linear`` is set. The three outputs share one
        per-call gather cache, so each (table, ids) pair is gathered by a
        SINGLE take op serving both towers (one backward scatter).
        """
        cache = {}
        sparse_cols, varlen_cols, _ = split_columns(self.feature_columns)
        self._reg_all()
        group_sparse = self.lookup(features, sparse_cols, cache=cache)
        dense_values = get_dense_input(features, self.feature_columns)
        if not support_dense and len(dense_values) > 0:
            raise ValueError("DenseFeat is not supported in dnn_feature_columns")
        group_varlen = self.pool_varlen(features, varlen_cols, cache=cache)
        merged = merge_group_dicts(group_sparse, group_varlen)
        sparse_out = (merged if support_group
                      else list(chain.from_iterable(merged.values())))
        if return_linear:
            return sparse_out, dense_values, self.linear_values(features, cache=cache)
        return sparse_out, dense_values


class LinearLogit(nn.Module):
    """Wide/linear tower (reference get_linear_logit, feature_column.py:171-210).

    Rebuilds the columns with dim-1 zero-init tables; ``units`` parallel linear
    terms (used by MLR); optional input-aware refinement weight (IFM/DIFM).
    Output: (B, units).
    """

    feature_columns: Tuple
    units: int = 1
    use_bias: bool = False
    l2_reg: float = 0.0
    prefix: str = "linear"

    @nn.compact
    def __call__(self, features, sparse_feat_refine_weight=None,
                 extra_sparse=None):
        """``extra_sparse`` (B, 1, F): folded wide-tower values produced by
        the deep funnel (EmbeddingTables.linear_values) — prepended to this
        tower's own sparse terms. With the fold active, ``feature_columns``
        holds only the non-foldable remainder (fold_linear_split)."""
        from .features import make_linear_columns
        from .layers.utils import Linear, concat_func

        linear_cols = tuple(make_linear_columns(self.feature_columns))
        logits = []
        for i in range(self.units):
            tower = EmbeddingTables(
                linear_cols, self.l2_reg, prefix=self.prefix + str(i),
                name="emb_" + self.prefix + str(i),
            )
            sparse_list, dense_list = tower(features)
            dense_input = concat_func(dense_list) if dense_list else None
            if dense_input is not None and dense_input.ndim > 2:
                dense_input = dense_input.reshape(dense_input.shape[0], -1)
            if extra_sparse is not None:
                sparse_list = [extra_sparse] + list(sparse_list)
            sparse_input = None
            if sparse_list:
                sparse_input = concat_func(sparse_list)  # (B, 1, F)
                if sparse_feat_refine_weight is not None:
                    sparse_input = sparse_input * sparse_feat_refine_weight[:, None, :]
            if sparse_input is not None and dense_input is not None:
                mode = 2
            elif sparse_input is not None:
                mode = 0
            elif dense_input is not None:
                mode = 1
            else:
                B = next(iter(features.values())).shape[0]
                return jnp.zeros((B, 1), jnp.float32)
            logit = Linear(self.l2_reg, mode=mode, use_bias=self.use_bias,
                           name="linear_%d" % i)(sparse_input, dense_input)
            logits.append(logit)
        return concat_func(logits) if len(logits) > 1 else logits[0]


# ---------------------------------------------------------------------------
# Reference functional custom-model API (deepctr/inputs.py:40-158 +
# deepctr/feature_column.py:93-233).
#
# The reference exposes a functional toolkit for custom models: build an
# embedding container once, then look up / pool / combine. Here every name
# maps onto the single EmbeddingTables funnel (dedup, compat checks, hashing,
# masks, engine/sharded-lookup routing all live there), so custom models get
# the same TPU path as the zoo. Each function must run inside a flax module
# context (an ``@nn.compact`` ``__call__``) — the same way the reference
# versions must run inside a Keras functional graph. docs/Custom-Models.md
# shows the ported recipe.
# ---------------------------------------------------------------------------


def get_inputs_list(inputs):
    """Flatten a list of (possibly None) feature dicts into one list of
    values (reference inputs.py:40-41)."""
    return list(chain(*(d.values() for d in inputs if d is not None)))


def create_embedding_matrix(feature_columns, l2_reg, seed=1024, prefix="",
                            seq_mask_zero=True):
    """Embedding container for ``feature_columns`` (reference
    feature_column.py:93-101). TPU design: ONE ``EmbeddingTables`` module
    instead of a dict of Keras layers — index it by ``embedding_name`` for a
    row-lookup callable, or call its lookup/pool methods. ``seed`` is
    accepted for signature parity (initializer keys come from the flax RNG
    tree)."""
    del seed
    return EmbeddingTables(
        tuple(feature_columns), l2_reg,
        prefix=(prefix + "sparse") if prefix else "sparse",
        seq_mask_zero=seq_mask_zero,
        name=(prefix + "embeddings") if prefix else "embeddings",
    )


def create_embedding_dict(sparse_feature_columns, varlen_sparse_feature_columns,
                          seed, l2_reg, prefix="sparse_", seq_mask_zero=True):
    """Reference inputs.py:44-72 — same container as
    :func:`create_embedding_matrix`, built from pre-split column lists."""
    del seed
    cols = tuple(sparse_feature_columns or ()) + tuple(
        varlen_sparse_feature_columns or ())
    return EmbeddingTables(
        cols, l2_reg, prefix=prefix, seq_mask_zero=seq_mask_zero,
        name=prefix + "embeddings",
    )


def embedding_lookup(sparse_embedding_dict, sparse_input_dict,
                     sparse_feature_columns, return_feat_list=(),
                     mask_feat_list=(), to_list=False):
    """Grouped sparse lookups (reference inputs.py:101-117).

    ``mask_feat_list`` is accepted for parity; hashed ids are computed on
    the host (features.canonicalize_batch) where mask_zero semantics are
    applied, so it is not needed here."""
    del mask_feat_list
    return sparse_embedding_dict.lookup(
        sparse_input_dict, sparse_feature_columns,
        return_feat_list=return_feat_list, to_list=to_list)


def varlen_embedding_lookup(embedding_dict, sequence_input_dict,
                            varlen_sparse_feature_columns):
    """Raw (B, T, E) sequence embeddings keyed by feature name (reference
    inputs.py:120-130)."""
    return embedding_dict.varlen_lookup(
        sequence_input_dict, varlen_sparse_feature_columns)


def get_varlen_pooling_list(embedding_dict, features,
                            varlen_sparse_feature_columns, to_list=False,
                            seq_mask_zero=True):
    """Pooled varlen embeddings, grouped (reference inputs.py:133-158).

    Duck-typed first argument, so BOTH reference idioms port verbatim:

    - an :class:`EmbeddingTables` container (tables-first convention) —
      the fast funnel path (fused gather+pool, shared gather cache, and
      the container's own ``seq_mask_zero`` setting);
    - the ``{name: (B, T, E)}`` mapping returned by
      :func:`varlen_embedding_lookup` (the reference convention, where the
      first arg is a dict of already-looked-up sequence tensors). Pass
      ``seq_mask_zero=False`` here to mirror a container built with
      ``create_embedding_matrix(..., seq_mask_zero=False)`` — raw arrays
      carry no mask, so the setting cannot be inferred.
    """
    if hasattr(embedding_dict, "pool_varlen"):
        return embedding_dict.pool_varlen(
            features, varlen_sparse_feature_columns, to_list=to_list)
    from .layers.base import sequence_mask

    group = defaultdict(list)
    for fc in varlen_sparse_feature_columns:
        seq = embedding_dict[fc.name]
        if fc.length_name is not None:
            mask = sequence_mask(features[fc.length_name], fc.maxlen,
                                 jnp.bool_)
        elif seq_mask_zero:
            # Keras mask_zero parity: id 0 is padding
            mask = features[fc.name].astype(jnp.int32) != 0
        else:
            mask = jnp.ones(features[fc.name].shape[:2], jnp.bool_)
        if fc.weight_name is not None:
            seq = weighted_sequence(
                seq, features[fc.weight_name], mask=mask,
                weight_normalization=fc.weight_norm)
        vec = sequence_pooling(seq, fc.combiner, mask=mask)
        group[fc.group_name].append(vec)
    if to_list:
        return list(chain.from_iterable(group.values()))
    return group


def get_embedding_vec_list(embedding_dict, input_dict, sparse_feature_columns,
                           return_feat_list=(), mask_feat_list=()):
    """Per-feature embedding list in column order (reference
    inputs.py:74-89; used by MLR)."""
    del mask_feat_list
    out = []
    for fc in sparse_feature_columns:
        if len(return_feat_list) == 0 or fc.name in return_feat_list:
            out.append(embedding_dict[fc.embedding_name](input_dict[fc.name]))
    return out


def input_from_feature_columns(features, feature_columns, l2_reg, seed=1024,
                               prefix="", seq_mask_zero=True,
                               support_dense=True, support_group=False):
    """THE custom-model entry point (reference feature_column.py:213-233):
    (sparse embedding list | group dict, dense value list)."""
    tables = create_embedding_matrix(feature_columns, l2_reg, seed=seed,
                                     prefix=prefix,
                                     seq_mask_zero=seq_mask_zero)
    return tables(features, support_dense=support_dense,
                  support_group=support_group)


def get_linear_logit(features, feature_columns, units=1, use_bias=False,
                     seed=1024, prefix="linear", l2_reg=0,
                     sparse_feat_refine_weight=None):
    """Wide/linear tower logit (B, units) (reference
    feature_column.py:171-210; ``sparse_feat_refine_weight`` is the
    IFM/DIFM input-aware (B, F) refinement)."""
    del seed
    return LinearLogit(
        tuple(feature_columns), units=units, use_bias=use_bias,
        l2_reg=l2_reg, prefix=prefix, name=prefix,
    )(features, sparse_feat_refine_weight=sparse_feat_refine_weight)


class Embedding(nn.Module):
    """Keras-``Embedding``-shaped table for custom layers (the reference
    re-exports ``tf.keras.layers.Embedding`` from deepctr.inputs). Masks are
    explicit in this framework, so ``mask_zero`` only records intent —
    compute the mask as ``ids != 0`` and pass it where needed."""

    input_dim: int
    output_dim: int
    embeddings_initializer: object = ("normal", 0.0, 0.0001)
    mask_zero: bool = False

    @nn.compact
    def __call__(self, ids):
        table = self.param(
            "embeddings", resolve_initializer(self.embeddings_initializer),
            (self.input_dim, self.output_dim))
        return jnp.take(table, jnp.asarray(ids).astype(jnp.int32), axis=0,
                        mode="clip")
