"""Explicit row-sharded embedding lookup over a device mesh.

The embedding plan places each (V, E) table row-sharded over the 'model'
mesh axis (parallel/sharding.py). Lookups under pjit are handled by XLA's
auto-collectives; this module provides the same operation as an EXPLICIT
shard_map program — the deliberate TPU-native design from SURVEY §2.6 — so
the communication pattern is visible, testable, and benchmarkable:

- every device holds rows [d*V/n, (d+1)*V/n) of the table;
- ids are data-sharded over the 'data' axis and replicated over 'model';
- each device gathers the ids that fall in its row range (others contribute
  zeros) and a psum over 'model' assembles full rows.

For CTR-sized id batches this replicated-compute + psum strategy moves
O(B*E) bytes over ICI per step — the same volume an all-to-all exchange
would move, with a fraction of the bookkeeping. An all-to-all variant
(bucket ids per owner, exchange, gather locally, return) becomes profitable
when B*E outgrows the id-dedup savings; planned as a follow-up.
"""
from __future__ import annotations

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


def place_for_sharded_lookup(table, ids, mesh, model_axis="model",
                             data_axis="data"):
    """device_put the operands with the shardings sharded_lookup expects."""
    table = jax.device_put(table, NamedSharding(mesh, P(model_axis, None)))
    ids = jax.device_put(ids, NamedSharding(mesh, P(data_axis)))
    return table, ids
