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


def test_packed_small_e_same_line_collisions():
    """E=16 packs 8 rows/lane-line; adjacent sorted ids share a line and
    must be pre-summed (never two RMWs of one line)."""
    rng = np.random.RandomState(4)
    V, E = 64, 16  # k = 8 rows per 128-lane line
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    # sorted unique ids with heavy same-line clustering + padding tail
    uids = jnp.asarray([0, 1, 2, 3, 8, 9, 15, 16, 63, V, V], dtype=jnp.int32)
    upd = jnp.asarray(rng.standard_normal((11, E)).astype(np.float32))
    got = scatter_add_rows(table, uids, upd, interpret=True,
                           assume_sorted=True)
    want = np.asarray(table).copy()
    for i, u in enumerate(np.asarray(uids)):
        if u < V:
            want[u] += np.asarray(upd)[i]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_negative_ids_are_skipped():
    rng = np.random.RandomState(5)
    V, E = 32, 16
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    uids = jnp.asarray([-7, -1, 4, 12, V + 2], dtype=jnp.int32)
    upd = jnp.asarray(rng.standard_normal((5, E)).astype(np.float32))
    got = scatter_add_rows(table, uids, upd, interpret=True,
                           assume_sorted=True)
    want = np.asarray(table).copy()
    want[4] += np.asarray(upd)[2]
    want[12] += np.asarray(upd)[3]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_wide_e_multi_line():
    """E=256 expands each row to 2 whole lines."""
    rng = np.random.RandomState(6)
    V, E, N = 16, 256, 5
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    uids = jnp.asarray([1, 3, 7, 11, V], dtype=jnp.int32)
    upd = jnp.asarray(rng.standard_normal((N, E)).astype(np.float32))
    got = scatter_add_rows(table, uids, upd, interpret=True,
                           assume_sorted=True)
    want = np.asarray(table).copy()
    for i, u in enumerate(np.asarray(uids)):
        if u < V:
            want[u] += np.asarray(upd)[i]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_unsorted_ids_internal_sort_on_packed_path():
    rng = np.random.RandomState(7)
    V, E = 64, 16
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    uids = jnp.asarray([9, 0, 63, 8, 1], dtype=jnp.int32)  # unsorted unique
    upd = jnp.asarray(rng.standard_normal((5, E)).astype(np.float32))
    got = scatter_add_rows(table, uids, upd, interpret=True)
    want = np.asarray(table).copy()
    for i, u in enumerate(np.asarray(uids)):
        want[u] += np.asarray(upd)[i]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
