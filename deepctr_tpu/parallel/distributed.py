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
