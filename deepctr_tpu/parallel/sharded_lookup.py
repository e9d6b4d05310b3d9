"""Explicit row-sharded embedding lookup over a device mesh.

The embedding plan places each (V, E) table row-sharded over the 'model'
mesh axis (parallel/sharding.py). Lookups under pjit are handled by XLA's
auto-collectives; this module provides the same operation as EXPLICIT
shard_map programs — the deliberate TPU-native design from SURVEY §2.6 — so
the communication pattern is visible, testable, and benchmarkable. Two
strategies:

``sharded_lookup`` (replicated-compute + psum):
- every device holds rows [d*V/n, (d+1)*V/n) of the table;
- ids are data-sharded over the 'data' axis and replicated over 'model';
- each device gathers the ids that fall in its row range (others contribute
  zeros) and a psum over 'model' assembles full rows.
- ICI traffic: O(B * E * n_model) row-bytes enter the psum reduction.

``sharded_lookup_a2a`` (bucket ids per owner -> all_to_all -> local gather
-> all_to_all return -> unpermute; the BASELINE.json north-star exchange):
- ICI traffic: O(B) id-bytes + O(B * E) row-bytes, INDEPENDENT of the
  model-axis size — the asymptotically right pattern as meshes grow.
- A fixed per-owner ``capacity`` bounds the exchange buffers (the standard
  TPU-embedding capacity-factor design); with the default (capacity =
  full local batch) the lookup is exact for any id skew.
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp

try:  # jax >= 0.4.35 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


def sharded_lookup(table, ids, mesh, model_axis="model", data_axis="data"):
    """Gather rows of a row-sharded table. ids: any integer shape.

    table must be shardable: V divisible by mesh.shape[model_axis].
    Returns rows with shape ids.shape + (E,), data-sharded on axis 0.
    """
    V, E = table.shape
    n_model = mesh.shape[model_axis]
    if V % n_model != 0:
        raise ValueError("vocab %d not divisible by model axis %d" % (V, n_model))
    rows_per_shard = V // n_model

    def local_lookup(table_shard, ids_shard):
        # position of this device along the model axis
        m = jax.lax.axis_index(model_axis)
        start = m * rows_per_shard
        # mode="clip" parity with the single-chip path (inputs.py)
        flat = jnp.clip(ids_shard.reshape(-1), 0, V - 1)
        local = flat - start
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        rows = jnp.take(table_shard, safe, axis=0)
        rows = jnp.where(in_range[:, None], rows, 0.0)
        rows = jax.lax.psum(rows, axis_name=model_axis)
        return rows.reshape(ids_shard.shape + (E,))

    return shard_map(
        local_lookup, mesh=mesh,
        in_specs=(P(model_axis, None), P(data_axis)),
        out_specs=P(data_axis),
    )(table, ids)


def sharded_lookup_a2a(table, ids, mesh, model_axis="model",
                       data_axis="data", capacity=None,
                       return_overflow=False):
    """All-to-all row-sharded lookup (see module docstring).

    table (V, E) row-sharded over ``model_axis``; ids data-sharded on axis
    0 (replicated over ``model_axis``). The lookup work is model-parallel:
    each model shard serves a 1/n_model slice of its data shard's ids, and
    a final all_gather reassembles the batch. ``capacity`` bounds the
    per-owner exchange bucket (default: the full per-shard id slice —
    exact under any skew). Ids overflowing a bucket return ZERO rows (the
    standard capacity-factor drop semantics; size capacity for your skew,
    or leave the exact default).
    Returns rows with shape ids.shape + (E,), data-sharded on axis 0.
    ``return_overflow=True`` additionally returns the GLOBAL count of ids
    dropped by capacity overflow this call (int32 scalar, replicated) — the
    observability signal for a mis-sized capacity (a silent zero-row drop
    in production is otherwise invisible).
    """
    V, E = table.shape
    n_model = mesh.shape[model_axis]
    if V % n_model != 0:
        raise ValueError("vocab %d not divisible by model axis %d" % (V, n_model))
    R = V // n_model

    def local_lookup(table_shard, ids_shard):
        m = jax.lax.axis_index(model_axis)
        flat = jnp.clip(ids_shard.reshape(-1).astype(jnp.int32), 0, V - 1)
        B = flat.shape[0]
        # each model shard serves a 1/n_model slice of this data shard's ids
        # (the lookup work itself is model-parallel, unlike the psum variant
        # where every shard scans the full batch)
        Bm = -(-B // n_model)
        flat_p = jnp.concatenate(
            [flat, jnp.zeros((Bm * n_model - B,), jnp.int32)]
        ) if Bm * n_model != B else flat
        my = jax.lax.dynamic_slice(flat_p, (m * Bm,), (Bm,))
        C = Bm if capacity is None else int(capacity)
        owner = my // R
        order = jnp.argsort(owner, stable=True)
        s_owner = owner[order]
        s_ids = my[order]
        pos = jnp.arange(Bm, dtype=jnp.int32)
        # first position of each owner's run -> index within the bucket
        bucket_start = jnp.searchsorted(s_owner, s_owner, side="left")
        idx_in_bucket = pos - bucket_start.astype(jnp.int32)
        ok = idx_in_bucket < C
        slot = s_owner * C + idx_in_bucket
        send_ids = jnp.full((n_model * C,), -1, jnp.int32).at[slot].set(
            jnp.where(ok, s_ids, -1), mode="drop"
        ).reshape(n_model, C)
        # exchange: bucket j goes to owner shard j
        recv_ids = jax.lax.all_to_all(send_ids, model_axis, 0, 0)
        local_idx = recv_ids - m * R
        valid = (recv_ids >= 0) & (local_idx >= 0) & (local_idx < R)
        rows = jnp.take(table_shard, jnp.clip(local_idx, 0, R - 1).reshape(-1),
                        axis=0).reshape(n_model, C, E)
        rows = jnp.where(valid[..., None], rows, 0.0)
        # return exchange: served rows go back to their requesting shard
        back = jax.lax.all_to_all(rows, model_axis, 0, 0)
        rows_flat = back.reshape(n_model * C, E)
        got = jnp.where(ok[:, None], rows_flat[jnp.where(ok, slot, 0)], 0.0)
        inv = jnp.zeros((Bm,), jnp.int32).at[order].set(pos)
        mine = got[inv]  # (Bm, E), this shard's slice in original order
        # assemble the full data-shard batch on every model shard — the
        # all_gather also makes model-replication statically known
        out = jax.lax.all_gather(mine, model_axis, axis=0, tiled=True)[:B]
        out = out.reshape(ids_shard.shape + (E,))
        if not return_overflow:
            return out
        n_drop = jnp.sum(~ok).astype(jnp.int32)
        n_drop = jax.lax.psum(n_drop, axis_name=model_axis)
        n_drop = jax.lax.psum(n_drop, axis_name=data_axis)
        return out, n_drop

    # the all_gather over model_axis makes the output replicated over
    # 'model'; the static varying-axes analysis can't always infer that, so
    # disable the check (semantics verified by tests/parallel_test.py)
    out_specs = (P(data_axis), P()) if return_overflow else P(data_axis)
    try:
        f = shard_map(
            local_lookup, mesh=mesh,
            in_specs=(P(model_axis, None), P(data_axis)),
            out_specs=out_specs, check_vma=False,
        )
    except TypeError:  # older jax spells it check_rep
        f = shard_map(
            local_lookup, mesh=mesh,
            in_specs=(P(model_axis, None), P(data_axis)),
            out_specs=out_specs, check_rep=False,
        )
    return f(table, ids)


def place_for_sharded_lookup(table, ids, mesh, model_axis="model",
                             data_axis="data"):
    """device_put the operands with the shardings sharded_lookup expects."""
    table = jax.device_put(table, NamedSharding(mesh, P(model_axis, None)))
    ids = jax.device_put(ids, NamedSharding(mesh, P(data_axis)))
    return table, ids


# ---- product-path routing (compile(sharded_lookup=...)) ----------------
# The funnel (inputs.py EmbeddingTables._take_full) consults this scope at
# TRACE time, exactly like layers.base.compute_dtype: when a CTRModel was
# compiled with sharded_lookup="auto"|"a2a"|"psum" and a mesh, eligible
# table gathers route through the explicit shard_map programs above instead
# of jnp.take + XLA auto-SPMD. Eligibility mirrors the table PLACEMENT
# policy (sharding.param_partition_spec): only tables that are actually
# row-sharded take the collective path; replicated tables keep the local
# gather they were placed for.
_LOOKUP_SCOPE = [None]


@contextlib.contextmanager
def sharded_lookup_scope(mode, mesh, capacity=None):
    """Activate explicit sharded lookups for a trace. ``mode``:
    'a2a' | 'psum' | 'auto' (a2a on model axes >= 4 — its ICI volume is
    independent of the axis size — psum below, where the single all-reduce's
    lower collective count wins)."""
    _LOOKUP_SCOPE.append({"mode": mode, "mesh": mesh, "capacity": capacity})
    try:
        yield
    finally:
        _LOOKUP_SCOPE.pop()


def active_lookup_scope():
    return _LOOKUP_SCOPE[-1]


def routed_take(table, ids, overflow_sink=None):
    """The funnel's gather with scope routing. Returns jnp.take semantics
    (mode='clip', rows shape ids.shape + (E,)); when a sharded_lookup_scope
    is active and ``table`` is row-shardable under its mesh's placement
    policy, the gather runs as the explicit shard_map exchange.
    ``overflow_sink(count)`` receives the a2a capacity-drop counter when
    the scope carries an explicit capacity."""
    scope = active_lookup_scope()
    if scope is not None and getattr(table, "ndim", 0) == 2:
        from .mesh import data_axis as _daxis, model_axis as _maxis
        from .sharding import _MIN_ROWS_TO_SHARD

        mesh = scope["mesh"]
        maxis = _maxis(mesh)
        n_model = mesh.shape[maxis] if maxis else 1
        V = table.shape[0]
        if (maxis is not None and n_model > 1 and V % n_model == 0
                and V >= _MIN_ROWS_TO_SHARD["value"]):
            mode = scope["mode"]
            if mode == "auto":
                mode = "a2a" if n_model >= 4 else "psum"
            if mode == "psum":
                return sharded_lookup(table, ids, mesh, model_axis=maxis,
                                      data_axis=_daxis(mesh))
            if scope["capacity"] is not None and overflow_sink is not None:
                rows, n_drop = sharded_lookup_a2a(
                    table, ids, mesh, model_axis=maxis,
                    data_axis=_daxis(mesh), capacity=scope["capacity"],
                    return_overflow=True)
                overflow_sink(n_drop)
                return rows
            return sharded_lookup_a2a(
                table, ids, mesh, model_axis=maxis, data_axis=_daxis(mesh),
                capacity=scope["capacity"])
    if getattr(table, "ndim", 0) == 2:
        # small-vocab tables: VMEM-resident one-hot MXU gather/scatter
        # removes these rows from the HBM random-row bill entirely
        # (ops/small_vocab.py — the round-5 sequence-tier attack)
        from ..ops.small_vocab import maybe_mxu_gather

        rows = maybe_mxu_gather(table, ids)
        if rows is not None:
            return rows
    return jnp.take(table, ids, axis=0, mode="clip")
