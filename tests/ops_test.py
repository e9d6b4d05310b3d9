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


class TestFusedPoolFunnelIntegration:
    """compile(fused_gather_pool=True) routes eligible varlen features
    through the Pallas kernel with model-level parity (VERDICT #6)."""

    def _build(self, fused):
        import numpy as np
        from deepctr_tpu import (DenseFeat, SparseFeat, VarLenSparseFeat)
        from deepctr_tpu.models import DeepFM

        rng = np.random.RandomState(0)
        cols = [
            SparseFeat("s0", 32, 16),
            DenseFeat("d0", 1),
            VarLenSparseFeat(SparseFeat("v_sum", 32, 16), maxlen=5,
                             combiner="sum"),
            VarLenSparseFeat(SparseFeat("v_mean", 32, 16), maxlen=5,
                             combiner="mean"),
            VarLenSparseFeat(SparseFeat("v_max", 32, 16), maxlen=5,
                             combiner="max"),
            VarLenSparseFeat(SparseFeat("v_len", 32, 16), maxlen=5,
                             combiner="mean", length_name="v_len_len"),
        ]
        n = 24
        x = {
            "s0": rng.randint(0, 32, n),
            "d0": rng.rand(n),
            "v_sum": rng.randint(0, 32, (n, 5)),
            "v_mean": rng.randint(0, 32, (n, 5)),
            "v_max": rng.randint(0, 32, (n, 5)),
            "v_len": rng.randint(1, 32, (n, 5)),
            "v_len_len": rng.randint(1, 6, n),
        }
        y = rng.randint(0, 2, n).astype("float32")
        model = DeepFM(cols, cols, dnn_hidden_units=(4,), seed=1024)
        model.compile("adam", "binary_crossentropy",
                      fused_gather_pool=fused)
        return model, x, y

    def test_model_parity_fused_vs_xla(self):
        from deepctr_tpu.ops.embedding import set_fused_gather_pool

        try:
            m0, x, y = self._build(False)
            h0 = m0.fit(x, y, batch_size=8, epochs=2, shuffle=False, verbose=0)
            p0 = m0.predict(x)
            m1, x, y = self._build(True)
            h1 = m1.fit(x, y, batch_size=8, epochs=2, shuffle=False, verbose=0)
            p1 = m1.predict(x)
            np.testing.assert_allclose(h1.history["loss"], h0.history["loss"],
                                       rtol=2e-4)
            np.testing.assert_allclose(p1, p0, rtol=2e-4, atol=1e-6)
        finally:
            set_fused_gather_pool(False)

    def test_fused_pool_small_e_packing_matches_reference(self):
        from deepctr_tpu.ops.embedding import (fused_gather_pool,
                                               reference_gather_pool)

        rng = np.random.RandomState(1)
        for V, E in ((32, 16), (16, 32), (64, 64), (8, 128)):
            table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
            ids = jnp.asarray(rng.randint(0, V, (6, 4)).astype(np.int32))
            mask = jnp.asarray(rng.randint(0, 2, (6, 4)).astype(np.float32))
            for comb in ("sum", "mean", "max"):
                got = fused_gather_pool(table, ids, mask, comb, True)
                want = reference_gather_pool(table, ids, mask, comb)
                np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                           rtol=1e-5, atol=1e-5,
                                           err_msg="%s V=%d E=%d" % (comb, V, E))
