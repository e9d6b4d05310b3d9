"""Pallas row scatter-update kernel tests (interpret mode on CPU)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from deepctr_tpu.ops.scatter import scatter_add_rows


def test_scatter_add_rows_basic():
    rng = np.random.RandomState(0)
    V, E, N = 32, 16, 10
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    uids = jnp.asarray(rng.permutation(V)[:N].astype(np.int32))  # unique
    upd = jnp.asarray(rng.standard_normal((N, E)).astype(np.float32))
    got = scatter_add_rows(table, uids, upd, interpret=True)
    want = np.asarray(table).copy()
    for i, u in enumerate(np.asarray(uids)):
        want[u] += np.asarray(upd)[i]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_scatter_add_rows_skips_padding_ids():
    rng = np.random.RandomState(1)
    V, E = 16, 8
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    uids = jnp.asarray([3, V, V + 5, 7], dtype=jnp.int32)  # 2 padding slots
    upd = jnp.asarray(rng.standard_normal((4, E)).astype(np.float32))
    got = scatter_add_rows(table, uids, upd, interpret=True)
    want = np.asarray(table).copy()
    want[3] += np.asarray(upd)[0]
    want[7] += np.asarray(upd)[3]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_scatter_add_rows_non_tile_multiple():
    rng = np.random.RandomState(2)
    V, E, N = 64, 4, 13  # N not a multiple of the tile size
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    uids = jnp.asarray(rng.permutation(V)[:N].astype(np.int32))
    upd = jnp.asarray(rng.standard_normal((N, E)).astype(np.float32))
    got = scatter_add_rows(table, uids, upd, interpret=True)
    want = np.asarray(table).copy()
    for i, u in enumerate(np.asarray(uids)):
        want[u] += np.asarray(upd)[i]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_pallas_path_matches_xla_in_sparse_engine():
    """apply_sparse_updates(use_pallas=True) must equal the XLA path."""
    import jax

    from deepctr_tpu.training import sparse_embedding as se

    rng = np.random.RandomState(3)
    V, E, N = 40, 8, 24
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    acc = jnp.full((V, 1), 0.1, jnp.float32)
    ids = jnp.asarray(rng.randint(0, V, N).astype(np.int32))  # with dups
    grads = jnp.asarray(rng.standard_normal((N, E)).astype(np.float32))
    t_x, a_x = se._rowwise_adagrad_scatter(table, acc, ids, grads, 0.05, 1e-10)
    t_p, a_p = se._rowwise_adagrad_scatter(table, acc, ids, grads, 0.05, 1e-10,
                                           use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x), rtol=1e-5)
