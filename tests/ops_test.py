"""Pallas fused embedding gather+pool kernel tests (interpret mode on CPU)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepctr_tpu.ops.embedding import fused_gather_pool, reference_gather_pool


def _fixture(B=4, T=5, V=32, E=16, seed=0):
    rng = np.random.RandomState(seed)
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V, (B, T)).astype(np.int32))
    lengths = rng.randint(1, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lengths[:, None]).astype(np.float32))
    return table, ids, mask


@pytest.mark.parametrize("combiner", ["sum", "mean", "max"])
def test_fused_gather_pool_matches_reference(combiner):
    table, ids, mask = _fixture()
    got = fused_gather_pool(table, ids, mask, combiner, True)
    want = reference_gather_pool(table, ids, mask, combiner)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("combiner", ["sum", "mean"])
def test_fused_gather_pool_gradients(combiner):
    table, ids, mask = _fixture()

    def loss_fused(t):
        return jnp.sum(fused_gather_pool(t, ids, mask, combiner, True) ** 2)

    def loss_ref(t):
        return jnp.sum(reference_gather_pool(t, ids, mask, combiner) ** 2)

    g_fused = jax.grad(loss_fused)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_gather_pool_max_gradient():
    table, ids, mask = _fixture()

    def loss_fused(t):
        return jnp.sum(fused_gather_pool(t, ids, mask, "max", True) * 1.5)

    def loss_ref(t):
        return jnp.sum(reference_gather_pool(t, ids, mask, "max") * 1.5)

    g_fused = jax.grad(loss_fused)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
