"""Multi-host initialization (SURVEY §2.6: multi-worker over DCN).

The reference delegates multi-worker training to TF's Estimator/TF_CONFIG;
here multi-host is plain ``jax.distributed`` + the same mesh code — data
parallel across hosts over DCN, model parallel within a slice over ICI.
"""
from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed; returns True when a multi-process runtime
    was set up. Safe to call unconditionally: a second call and
    environments where cluster parameters can't be auto-detected (plain
    CPU/GPU dev boxes) degrade to a no-op returning False."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError):
        # already initialized, or nothing to auto-detect on this host
        return False


def global_mesh(shape, axis_names=("data", "model")):
    """Mesh over ALL devices across every host (device order is
    jax.devices(), which groups by process)."""
    from .mesh import make_mesh

    return make_mesh(shape, axis_names, jax.devices())


def make_global_batch(mesh, *trees):
    """Assemble global jax.Arrays from PROCESS-LOCAL batch shards.

    Each process passes its local rows; the result is one global array per
    leaf, sharded on axis 0 over the mesh's data axis (the multi-host
    equivalent of the reference's between-graph replication where every
    worker feeds its own input pipeline). Leaves must have equal local row
    counts across processes.
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_axis = mesh.axis_names[0]

    def conv(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(data_axis, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x)

    out = tuple(jax.tree.map(conv, t) for t in trees)
    return out if len(out) > 1 else out[0]


def make_global_batch_stacked(mesh, *trees):
    """Like ``make_global_batch`` for K-STACKED batches: each process
    passes (K, local_rows, ...) arrays; the result is global arrays
    sharded on axis 1 over the data axis (axis 0 is the scan axis of the
    ``steps_per_execution`` multi-step program — identical K on every
    process)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_axis = mesh.axis_names[0]

    def conv(x):
        x = np.asarray(x)
        sharding = NamedSharding(
            mesh, P(None, data_axis, *([None] * (x.ndim - 2))))
        return jax.make_array_from_process_local_data(sharding, x)

    out = tuple(jax.tree.map(conv, t) for t in trees)
    return out if len(out) > 1 else out[0]


def replicate_state_globally(state, mesh):
    """Turn host-identical TrainState leaves into global arrays placed by
    the standard sharding rules (params row-sharded when divisible,
    everything else replicated) across every process in the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .sharding import param_partition_spec

    def place_params(path, leaf):
        spec = param_partition_spec(path, leaf, mesh)
        leaf = jax.device_get(leaf)  # host-identical on every process
        return jax.make_array_from_callback(
            leaf.shape, NamedSharding(mesh, spec),
            lambda idx, _l=leaf: _l[idx],
        )

    import jax.tree_util as jtu

    params = jtu.tree_map_with_path(place_params, state.params)

    def replicate(leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        host = jax.device_get(leaf)
        return jax.make_array_from_callback(
            host.shape, NamedSharding(mesh, P()),
            lambda idx, _l=host: _l[idx],
        )

    model_state = jax.tree.map(replicate, state.model_state)
    opt_state = jax.tree.map(replicate, state.opt_state)
    embed_state = (jax.tree.map(replicate, state.embed_state)
                   if state.embed_state is not None else None)
    step = replicate(state.step)
    return state.replace(params=params, model_state=model_state,
                         opt_state=opt_state, embed_state=embed_state,
                         step=step)
