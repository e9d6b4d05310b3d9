"""Sharding rules: param placement and batch constraints under a mesh.

Strategy (SURVEY §2.6 "TPU-native equivalent"):
- embedding tables (params named ``emb_*``) are row-sharded across the
  'model' axis when the vocab divides evenly — the all-to-all exchange for
  sharded lookups is inserted by XLA from these annotations;
- all other (dense) params are replicated; batch arrays are sharded on
  axis 0 over 'data'.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import data_axis, model_axis


def _is_embedding_path(path) -> bool:
    return any(str(getattr(k, "key", k)).startswith("emb_") for k in path)


# Size-based placement policy (the practical core of RecShard/TorchRec
# table planners, arxiv 2201.10095): tables with fewer rows than this are
# REPLICATED instead of row-sharded — a tiny table's local gather is
# cheaper than the collective a sharded lookup pays, while big tables
# must shard for capacity. 0 (default) shards everything divisible,
# preserving maximal model-parallel coverage.
_MIN_ROWS_TO_SHARD = {"value": 0}


def set_min_rows_to_shard(rows: int):
    """Tables with vocab < ``rows`` stay replicated under the mesh."""
    _MIN_ROWS_TO_SHARD["value"] = int(rows)


def param_partition_spec(path, leaf, mesh) -> P:
    maxis = model_axis(mesh)
    if maxis is not None and mesh.shape[maxis] > 1:
        if _is_embedding_path(path) and getattr(leaf, "ndim", 0) == 2:
            rows = leaf.shape[0]
            if (rows % mesh.shape[maxis] == 0
                    and rows >= _MIN_ROWS_TO_SHARD["value"]):
                return P(maxis, None)
    return P()


def shard_params(params, mesh):
    def place(path, leaf):
        spec = param_partition_spec(path, leaf, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh, ndim):
    return NamedSharding(mesh, P(data_axis(mesh), *([None] * (ndim - 1))))


def shard_batch(mesh, tree):
    """device_put batch arrays sharded on axis 0 over 'data'."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, jnp.ndim(x))), tree
    )


def constrain_batch(mesh, *trees):
    """In-jit sharding constraints for batch pytrees."""
    out = []
    for tree in trees:
        out.append(
            jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, batch_sharding(mesh, jnp.ndim(x))
                ),
                tree,
            )
        )
    return tuple(out)


def shard_state(state, mesh):
    """Shard a TrainState: params by rule, everything else replicated.

    Note: opt_state leaves created by ``optimizer.init(sharded_params)``
    already inherit the param shardings; this handles the general case.
    """
    params = shard_params(state.params, mesh)
    model_state = replicate(state.model_state, mesh)
    opt_state = jax.tree.map(
        lambda x: x
        if not hasattr(x, "shape")
        else jax.device_put(x, NamedSharding(mesh, P())),
        state.opt_state,
    )
    return state.replace(params=params, model_state=model_state, opt_state=opt_state)
