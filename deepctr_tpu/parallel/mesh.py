"""Device mesh construction for data/model-parallel training.

The reference delegates distribution to TF (multi_gpu_model / Estimator,
SURVEY §2.6). Here parallelism is first-class: a ``jax.sharding.Mesh`` over
('data', 'model') — batch sharded over 'data' (gradients all-reduced by XLA
over ICI), embedding tables row-sharded over 'model'.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(shape=None, axis_names=("data", "model"), devices=None) -> Mesh:
    """Build a mesh over ``devices``.

    ``shape=None`` puts every device on the 'data' axis (pure DP).
    ``shape=(4, 2)`` -> 4-way data x 2-way model.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(
            "mesh shape {} needs {} devices, got {}".format(shape, n, len(devices))
        )
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_axis(mesh: Mesh) -> str:
    return mesh.axis_names[0]


def model_axis(mesh: Mesh):
    return mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
