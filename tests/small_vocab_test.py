"""VMEM-resident small-vocab MXU gather (ops/small_vocab.py).

The round-5 sequence-tier attack: sequence models are at their random-row
bound and half their ids hit tiny tables; this kernel serves those from
VMEM via one-hot matmuls. Tests run the kernel in interpret mode on CPU:
forward must be BIT-exact vs jnp.take(mode='clip'); gradients match the
take-VJP scatter to f32 ULP (sum order differs); the funnel route must
produce identical models when toggled.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepctr_tpu.ops import small_vocab as sv


@pytest.fixture(autouse=True)
def _restore_state():
    yield
    sv.set_small_vocab(None)


@pytest.mark.parametrize("V,E,shape", [
    (1000, 32, (64, 7)),     # DIN cate-history shape class
    (128, 8, (33,)),         # 1D ids, tiny table
    (4096, 128, (17, 3)),    # upper supported corner
    (130, 33, (5, 11)),      # unaligned V and E
])
def test_mxu_gather_matches_take(V, E, shape):
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(V, E).astype(np.float32))
    ids = jnp.asarray(rng.randint(-3, V + 3, shape).astype(np.int32))
    want = jnp.take(table, ids, axis=0, mode="clip")
    got = sv.mxu_gather(table, ids, True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    ct = jnp.asarray(rng.randn(*want.shape).astype(np.float32))
    g_take = jax.grad(
        lambda t: (jnp.take(t, ids, axis=0, mode="clip") * ct).sum())(table)
    g_mxu = jax.grad(lambda t: (sv.mxu_gather(t, ids, True) * ct).sum())(table)
    np.testing.assert_allclose(np.asarray(g_take), np.asarray(g_mxu),
                               atol=1e-5, rtol=1e-5)


def test_bf16_table_exact_forward_f32_accumulated_backward():
    rng = np.random.RandomState(1)
    table = jnp.asarray(rng.randn(500, 16).astype(np.float32)).astype(
        jnp.bfloat16)
    ids = jnp.asarray(rng.randint(0, 500, (256,)).astype(np.int32))
    want = jnp.take(table, ids, axis=0, mode="clip")
    got = sv.mxu_gather(table, ids, True)
    assert bool((want == got).all())
    g = jax.grad(lambda t: (sv.mxu_gather(t, ids, True).astype(
        jnp.float32) ** 2).sum())(table)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_eligibility_gates():
    assert sv.small_vocab_supported(1000, 32)
    assert not sv.small_vocab_supported(100_000, 16)   # criteo tables: no
    assert not sv.small_vocab_supported(1000, 512)
    sv.set_small_vocab(False)
    assert sv.maybe_mxu_gather(jnp.zeros((10, 4)), jnp.zeros(3, jnp.int32)) \
        is None
    sv.set_small_vocab(True, interpret=True)
    out = sv.maybe_mxu_gather(jnp.ones((10, 4)), jnp.zeros(3, jnp.int32))
    assert out is not None and out.shape == (3, 4)


def test_funnel_route_model_parity():
    """DIN with the kernel routed through the funnel == DIN without it:
    same params, same loss, same grads (to f32 tolerance)."""
    from tests.models.DIN_test import get_xy_fd
    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import DIN

    x, y, cols, behavior = get_xy_fd()
    y = np.asarray(y, np.float32)

    def run(enabled):
        sv.set_small_vocab(enabled, interpret=True)
        model = DIN(cols, behavior, dnn_hidden_units=(8,), seed=3)
        model.compile("adam", "binary_crossentropy")
        xc = canonicalize_batch(x, model.feature_columns)
        model._ensure_built(xc)
        step = model._build_train_step()
        import jax as _jax

        state, loss, _ = step(model.state, xc, y.reshape(-1, 1),
                              np.ones(len(y), np.float32),
                              _jax.random.PRNGKey(0))
        return float(loss), state.params

    loss_off, p_off = run(False)
    loss_on, p_on = run(True)
    assert abs(loss_off - loss_on) < 1e-6
    flat_off = jax.tree_util.tree_leaves(p_off)
    flat_on = jax.tree_util.tree_leaves(p_on)
    for a, b in zip(flat_off, flat_on):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-6, rtol=1e-4)
