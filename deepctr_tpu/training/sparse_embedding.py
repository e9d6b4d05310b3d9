"""Sparse embedding-update engine (the TPU-native "embedding engine v2").

Why: CTR models are HBM-bound on their embedding tables. With plain autodiff
the cotangent of a (V, E) table is a DENSE array (XLA scatter-adds row grads
into zeros) and the optimizer then rewrites the full table + state — O(V*E)
HBM traffic per step even though only O(batch) rows were touched.

This engine restructures the train step so dense table gradients never
exist:

1. **Plan discovery** — one instrumented forward pass with the
   'gather_plan' collection mutable records every (module path, feature,
   table, kind) lookup the model performs (inputs.py `_rows`).
2. **Hoisted gathers** — the train step gathers rows for every planned
   lookup OUTSIDE the loss; the module consumes them via the 'gathered'
   collection. `jax.grad` is taken w.r.t. (dense params, gathered rows), so
   table gradients arrive as row-sparse (ids, row_grads) pairs.
3. **In-step sparse optimizer** — per table, duplicates are resolved
   exactly with a sort + segment-sum, then a row-wise Adagrad scatter
   update touches only the gathered rows (update math identical to
   optimizers.rowwise_adagrad on the equivalent dense gradient).

Full-table l2 becomes lazy (touched-rows) l2 — the standard large-vocab
approximation. Tables accessed outside the lookup funnel (e.g. DSIN's
direct session gathers) keep working — they simply stay on the dense path.
Opt in with ``model.compile(..., sparse_embedding_updates=True)``.

Performance note (measured, TPU v5e, honest timing): this path is the
right asymptotic design (per-step table traffic O(batch-rows) instead of
O(vocab)), and it is the ONLY feasible design when dense per-step updates
no longer fit HBM (10M-row tables: bench_large_vocab.py trains 1.28B
embedding params where dense adam cannot allocate). At small vocab the
dense path wins on physics, not on implementation: at V=100k a full-table
pass costs V*E sequential bytes, while the engine pays a sorted scatter
read-modify-write per unique touched row — random small-row RMWs are
line-granular and scatter-serialized, so below the crossover vocab
(bench_crossover.py) full-table streaming is cheaper. The Pallas row-DMA
scatter (ops/scatter.py, ``use_pallas``) does not change this: 512-byte
line DMAs cost the same physics; it stays opt-in for determinism
experiments. Keep the default dense path at criteo-like vocabs and enable
the engine for large-vocab/production-scale tables.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


class PlanEntry(NamedTuple):
    module_path: Tuple[str, ...]  # scope of the owning EmbeddingTables
    feature: str                  # rows key; batch key after prefix strip
    embedding_name: str           # table param is "emb_" + embedding_name
    kind: int                     # 0 = sparse (B,), 1 = varlen (B, T)
    l2_reg: float = 0.0           # owning funnel's embedding l2 (lazy reg)

    @property
    def table_path(self) -> Tuple[str, ...]:
        return self.module_path + ("emb_" + self.embedding_name,)

    @property
    def rows_path(self) -> Tuple[str, ...]:
        return self.module_path + (self.feature,)

    @property
    def batch_key(self) -> str:
        # Folded wide-tower entries (inputs.LIN_ROWS_PREFIX) read the same
        # batch ids as their main feature but store rows under their own key.
        from ..inputs import LIN_ROWS_PREFIX

        if self.feature.startswith(LIN_ROWS_PREFIX):
            return self.feature[len(LIN_ROWS_PREFIX):]
        return self.feature


def discover_plan(module, variables, sample_batch) -> List[PlanEntry]:
    """Run one instrumented forward pass and return the gather plan.

    Tables that model code reads DIRECTLY (EmbeddingTables._table outside
    the lookup funnel, e.g. DSIN's session gathers) are excluded — their
    gradients cannot be hoisted, so they stay on the dense path.

    The pass runs ON THE HOST CPU: the plan is pure metadata, and
    executing this tiny instrumented program on the axon TPU backend was
    measured to permanently degrade every subsequent execution in the
    process by ~20x (engine update 0.67ms -> 13.5ms; bisected to exactly
    this call — see CLAUDE.md round-2 notes). Params round-trip through
    host memory once at build time.
    """
    cpu = jax.local_devices(backend="cpu")[0]
    variables = jax.tree.map(
        lambda x: np.asarray(jax.device_get(x)) if hasattr(x, "shape") else x,
        variables,
    )
    sample_batch = {k: np.asarray(jax.device_get(v))
                    for k, v in sample_batch.items()}
    with jax.default_device(cpu):
        _, mutated = module.apply(
            variables, sample_batch, training=False,
            mutable=["gather_plan", "losses", "batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
    plan: List[PlanEntry] = []
    direct_tables = set()
    flat = flatten_dict(mutated.get("gather_plan", {}))
    for path, meta in flat.items():
        *module_path, key = path
        feature, embedding_name = key.rsplit("|", 1)
        if feature == "__direct__":
            direct_tables.add(tuple(module_path) + ("emb_" + embedding_name,))
            continue
        meta = np.asarray(meta).reshape(-1)
        plan.append(PlanEntry(tuple(module_path), feature, embedding_name,
                              int(meta[0]), float(meta[1])))
    plan = [e for e in plan if e.table_path not in direct_tables]
    plan.sort()
    return plan


def split_tables(params, plan):
    """(dense_params, tables) — tables keyed by their flat param path."""
    flat = flatten_dict(params)
    tables = {}
    for entry in plan:
        p = entry.table_path
        if p in flat:
            tables[p] = flat.pop(p)
        elif p not in tables:
            raise ValueError("gather plan references missing param %s" % (p,))
    return unflatten_dict(flat), tables


def merge_tables(dense_params, tables):
    flat = dict(flatten_dict(dense_params))
    flat.update(tables)
    return unflatten_dict(flat)


def gather_rows(tables, batch, plan):
    """Hoisted gathers: {module_path + (feature,): rows} as a nested dict.
    Rows are upcast to f32 (matching the dense path's low-precision-storage
    convention in inputs.py `_rows`)."""
    rows_flat = {}
    for entry in plan:
        table = tables[entry.table_path]
        ids = batch[entry.batch_key].astype(jnp.int32)
        if entry.kind == 0:
            rows = jnp.take(table, ids.reshape(-1), axis=0, mode="clip")
        else:
            rows = jnp.take(table, ids, axis=0, mode="clip")
        if rows.dtype != jnp.float32:
            rows = rows.astype(jnp.float32)
        rows_flat[entry.rows_path] = rows
    return unflatten_dict(rows_flat)


def lazy_l2(rows, plan, sample_weight=None):
    """Touched-rows l2 term, exactly once per plan entry (replaces the dense
    path's full-table l2 in sparse-update mode).

    The reg is per-OCCURRENCE: a row looked up k times in the batch is
    charged k times (the standard lazy-l2 approximation of full-table l2).
    ``sample_weight`` masks out padding samples (data.py pads partial
    batches by duplicating the last sample with weight 0) so batch padding
    never adds reg gradient."""
    rows_flat = flatten_dict(rows)
    total = jnp.zeros((), jnp.float32)
    for entry in plan:
        if entry.l2_reg:
            r = rows_flat[entry.rows_path]
            sq = jnp.square(r)
            if sample_weight is not None:
                m = (sample_weight > 0).astype(jnp.float32)
                sq = sq * m.reshape((m.shape[0],) + (1,) * (sq.ndim - 1))
            total = total + entry.l2_reg * jnp.sum(sq)
    return total


def init_embed_state(tables, initial_accumulator_value=0.1):
    """Row-wise Adagrad accumulators, one scalar per table row."""
    return {
        path: jnp.full((t.shape[0], 1), initial_accumulator_value, jnp.float32)
        for path, t in tables.items()
    }


def _batched_rowwise_adagrad(ids_b, grads_b, accs, lr, eps):
    """Batched exact row-wise Adagrad math for T same-shaped tables.

    ids_b (T, N) may contain duplicates; grads_b (T, N, E); accs is a list
    of T (V, 1) accumulators. One BATCHED argsort + one FLAT segment-sum
    across all T tables: measured on TPU v5e, 26 per-table
    sort->segment-sum->scatter chains in one program schedule ~25x slower
    than this batched formulation (0.5ms vs 13.9ms at the criteo shape) —
    the round-1 engine's "XLA fuses hoisted row scatters into latency-bound
    loops" pathology was per-table op multiplication, not scatter itself.

    Returns (uids_b (T, N) sorted w/ V-padding tail, update_b (T, N, E),
    a_new_b (T, N)) ready for per-table scatters.
    """
    T, N = ids_b.shape
    V = accs[0].shape[0]
    ids_b = jnp.clip(ids_b, 0, V - 1)  # forward-gather (mode="clip") parity
    order = jnp.argsort(ids_b, axis=-1)
    s_ids = jnp.take_along_axis(ids_b, order, axis=-1)
    s_g = jnp.take_along_axis(grads_b, order[:, :, None], axis=1)
    new_seg = jnp.concatenate(
        [jnp.ones((T, 1), jnp.int32),
         (s_ids[:, 1:] != s_ids[:, :-1]).astype(jnp.int32)], axis=1
    )
    seg = jnp.cumsum(new_seg, axis=1) - 1  # (T, N) segment index per element
    gseg = (seg + jnp.arange(T, dtype=jnp.int32)[:, None] * N).reshape(-1)
    G = jax.ops.segment_sum(
        s_g.reshape(T * N, -1), gseg, num_segments=T * N,
        indices_are_sorted=True,
    ).reshape(T, N, -1)  # row-total grads at compacted segment slots
    # representative id per segment; unused slots parked out of range.
    # seg is dense 0..nseg-1 per table, so uids come out SORTED ascending
    # with the V-padding at the end — the layout the Pallas kernel's
    # lane-packed dedup requires (ops/scatter.py contract).
    row = jnp.arange(T, dtype=jnp.int32)[:, None]
    uids = jnp.full((T, N), V, jnp.int32).at[row, seg].set(s_ids, mode="drop")
    valid = uids < V
    G = jnp.where(valid[:, :, None], G, 0.0)
    safe_uids = jnp.where(valid, uids, 0)
    a_old = jnp.stack([accs[t][safe_uids[t], 0] for t in range(T)])
    a_new = a_old + jnp.mean(G * G, axis=2)
    update = -lr * G * jax.lax.rsqrt(a_new + eps)[:, :, None]
    return uids, update, a_new


def stochastic_round_bf16(x, key):
    """Unbiased f32 -> bf16 rounding: add uniform bits below the bf16
    mantissa cut, then truncate (the standard SR-to-bf16 construction;
    E[result] == x up to representable range)."""
    bits = jax.random.bits(key, x.shape, jnp.uint32)
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    v = (u + (bits & jnp.uint32(0xFFFF))) >> 16
    return jax.lax.bitcast_convert_type(v.astype(jnp.uint16), jnp.bfloat16)


def _scatter_into(table, acc, uids, update, a_new, use_pallas, interpret,
                  sr_key=None):
    """Apply one table's (sorted, V-padded) row updates + acc writes.

    ``sr_key`` (with a bf16 table) switches the write to read-modify-write
    with stochastic rounding: new_row = SR_bf16(f32(old_row) + update) —
    tiny per-step deltas survive instead of being truncated away (the
    classic low-precision-training failure for embedding tables).
    """
    if sr_key is not None and table.dtype == jnp.bfloat16:
        valid = (uids >= 0) & (uids < table.shape[0])
        safe = jnp.where(valid, uids, 0)
        old = jnp.take(table, safe, axis=0).astype(jnp.float32)
        rounded = stochastic_round_bf16(old + update, sr_key)
        rounded = jnp.where(valid[:, None], rounded, table[safe])
        table = table.at[uids].set(rounded, mode="drop",
                                   indices_are_sorted=True)
    elif use_pallas:
        from ..ops.scatter import scatter_add_rows

        # out-of-range uids (padding) are skipped by the kernel contract
        table = scatter_add_rows(table, uids, update.astype(table.dtype),
                                 interpret=interpret, assume_sorted=True)
    else:
        table = table.at[uids].add(update.astype(table.dtype), mode="drop",
                                   indices_are_sorted=True)
    acc = acc.at[uids, 0].set(a_new, mode="drop", indices_are_sorted=True)
    return table, acc


def _rowwise_adagrad_scatter(table, acc, ids, grads, lr, eps,
                             use_pallas=False, interpret=False):
    """Exact row-wise Adagrad on one table's row-sparse gradient (T=1 case
    of the batched path; kept as the unit-testable primitive)."""
    uids, update, a_new = _batched_rowwise_adagrad(
        ids[None, :], grads[None, :, :], [acc], lr, eps
    )
    return _scatter_into(table, acc, uids[0], update[0], a_new[0],
                         use_pallas, interpret)


def apply_sparse_updates(tables, embed_state, rows_grads, batch, plan,
                         learning_rate=0.01, eps=1e-10, use_pallas=False,
                         interpret=False, sr_key=None):
    """Scatter row-sparse updates into every planned table. ``sr_key``
    enables stochastic-rounded writes into bf16 tables (_scatter_into)."""
    grads_flat = flatten_dict(rows_grads)
    per_table: Dict[Tuple[str, ...], list] = defaultdict(list)
    for entry in plan:
        g = grads_flat[entry.rows_path]
        # clip parity with the forward gather (mode="clip"): out-of-range ids
        # credit the clamped row instead of dropping their gradient, and can
        # never drive an out-of-bounds row DMA in the Pallas kernel.
        V = tables[entry.table_path].shape[0]
        ids = jnp.clip(batch[entry.batch_key].astype(jnp.int32), 0, V - 1)
        E = g.shape[-1]
        per_table[entry.table_path].append(
            (ids.reshape(-1), g.reshape(-1, E))
        )
    # Group same-shaped tables with equal id counts so their sort +
    # segment-sum + adagrad math runs BATCHED (one sort op, one flat
    # segment-sum) — see _batched_rowwise_adagrad's measurement note.
    concatd = {}
    groups: Dict[Tuple[int, int, int], list] = defaultdict(list)
    for path, pairs in per_table.items():
        ids_all = jnp.concatenate([p[0] for p in pairs]) if len(pairs) > 1 else pairs[0][0]
        g_all = jnp.concatenate([p[1] for p in pairs]) if len(pairs) > 1 else pairs[0][1]
        concatd[path] = (ids_all, g_all)
        V, E = tables[path].shape
        groups[(ids_all.shape[0], V, E)].append(path)
    new_tables = dict(tables)
    new_state = dict(embed_state)
    for gi, key in enumerate(sorted(groups)):
        paths = sorted(groups[key])
        ids_b = jnp.stack([concatd[p][0] for p in paths])
        g_b = jnp.stack([concatd[p][1] for p in paths])
        uids_b, upd_b, anew_b = _batched_rowwise_adagrad(
            ids_b, g_b, [embed_state[p] for p in paths], learning_rate, eps
        )
        keys = (jax.random.split(jax.random.fold_in(sr_key, gi), len(paths))
                if sr_key is not None else [None] * len(paths))
        for t, path in enumerate(paths):
            new_tables[path], new_state[path] = _scatter_into(
                tables[path], embed_state[path], uids_b[t], upd_b[t],
                anew_b[t], use_pallas, interpret, sr_key=keys[t],
            )
    return new_tables, new_state
