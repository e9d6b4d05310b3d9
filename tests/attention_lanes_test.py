"""Lane-major attention path (ops/attention_lanes.py).

The round-5 DSIN/BST attack: tiny (T, head_dim) transformers run ~26x
over their logical bytes in the standard layout; the lane-major path
keeps the batch on the minor axis. Pure XLA, so CPU runs the REAL code
(no interpret mode). Parity vs the einsum path is contraction-order
noise only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepctr_tpu.layers.sequence import Transformer
from deepctr_tpu.ops.attention_lanes import (lane_attention_enabled,
                                             lane_attention_supported,
                                             set_lane_attention)


@pytest.fixture(autouse=True)
def _restore():
    yield
    set_lane_attention(None)


def _data(B=16, T=10, E=64, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, E).astype(np.float32))
    lens = jnp.asarray(rng.randint(1, T + 1, (B, 1)))
    return x, lens


@pytest.mark.parametrize("blinding,out_type,use_ln", [
    (True, "mean", False),   # DSIN configuration
    (False, None, True),     # BST configuration (res+LN+FFN, raw seq out)
    (True, "sum", False),
])
def test_transformer_parity(blinding, out_type, use_ln):
    x, lens = _data()
    D, H = 8, 8

    def run(on):
        set_lane_attention(on)
        tr = Transformer(D, H, dropout_rate=0.0, use_layer_norm=use_ln,
                         blinding=blinding, output_type=out_type)
        p = tr.init(jax.random.PRNGKey(0), x, x,
                    query_lengths=lens, key_lengths=lens)
        out = tr.apply(p, x, x, query_lengths=lens, key_lengths=lens)
        g = jax.grad(lambda pp: float(0) + (tr.apply(
            pp, x, x, query_lengths=lens, key_lengths=lens) ** 2).sum())(p)
        return out, g

    o0, g0 = run(False)
    o1, g1 = run(True)
    scale = float(jnp.abs(o0).max())
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=3e-5 * max(scale, 1.0), rtol=2e-4)
    # normalize by the GLOBAL grad scale: leaves whose true gradient is
    # numerically zero (e.g. pre-LayerNorm params — verified ~1e-6 vs the
    # 1e3-scale LN grads at f64) carry only cancellation residue, and two
    # valid contraction orders produce different residue
    gmax = max(float(jnp.abs(a).max())
               for a in jax.tree_util.tree_leaves(g0))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b) / gmax,
                                   np.asarray(a) / gmax, atol=5e-4)


def test_eligibility():
    assert lane_attention_supported(10, 10, 8)     # DSIN sessions: 3.49x
    assert not lane_attention_supported(50, 50, 16)   # BST T=50: 0.55x
    assert not lane_attention_supported(200, 200, 8)  # long seqs: no
    assert not lane_attention_supported(10, 10, 64)   # wide heads: no
    set_lane_attention(True)
    assert lane_attention_enabled()
    set_lane_attention(False)
    assert not lane_attention_enabled()


def test_dsin_model_parity():
    """Whole-model check: DSIN loss with the lane path == einsum path."""
    from tests.models.DSIN_test import get_xy_fd
    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import DSIN

    x, y, cols, behavior = get_xy_fd()
    y = np.asarray(y, np.float32)

    def loss_of(on):
        set_lane_attention(on)
        model = DSIN(cols, behavior, sess_max_count=2,
                     dnn_hidden_units=(8,), seed=9)
        model.compile("adam", "binary_crossentropy")
        xc = canonicalize_batch(x, model.feature_columns)
        model._ensure_built(xc)
        step = model._build_train_step()
        state, loss, _ = step(model.state, xc, y.reshape(-1, 1),
                              np.ones(len(y), np.float32),
                              jax.random.PRNGKey(0))
        return float(loss)

    assert abs(loss_of(False) - loss_of(True)) < 1e-5


def test_dropout_applies_in_lane_layout():
    x, lens = _data()
    set_lane_attention(True)
    tr = Transformer(8, 8, dropout_rate=0.5, use_layer_norm=False,
                     blinding=False, output_type="mean")
    p = tr.init(jax.random.PRNGKey(0), x, x,
                query_lengths=lens, key_lengths=lens)
    out_eval = tr.apply(p, x, x, query_lengths=lens, key_lengths=lens)
    out_tr1 = tr.apply(p, x, x, query_lengths=lens, key_lengths=lens,
                       training=True, rngs={"dropout": jax.random.PRNGKey(1)})
    out_tr2 = tr.apply(p, x, x, query_lengths=lens, key_lengths=lens,
                       training=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert float(jnp.abs(out_tr1 - out_eval).max()) > 1e-6
    assert float(jnp.abs(out_tr1 - out_tr2).max()) > 1e-6
    assert bool(jnp.isfinite(out_tr1).all())


def test_interacting_layer_parity():
    """AutoInt's InteractingLayer via the lane core == einsum path."""
    from deepctr_tpu.layers.interaction import InteractingLayer

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(16, 26, 16).astype(np.float32))

    from deepctr_tpu.ops.attention_lanes import set_lane_core

    def run(on, scaling):
        set_lane_attention(on)
        set_lane_core(on)   # the InteractingLayer route is opt-in
        layer = InteractingLayer(att_embedding_size=8, head_num=2,
                                 scaling=scaling)
        p = layer.init(jax.random.PRNGKey(0), x)
        out = layer.apply(p, x)
        g = jax.grad(lambda pp: (layer.apply(pp, x) ** 2).sum())(p)
        return out, g

    try:
        for scaling in (False, True):
            o0, g0 = run(False, scaling)
            o1, g1 = run(True, scaling)
            scale = max(float(jnp.abs(o0).max()), 1.0)
            np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                       atol=3e-5 * scale, rtol=2e-4)
            gmax = max(float(jnp.abs(a).max())
                       for a in jax.tree_util.tree_leaves(g0))
            for a, b in zip(jax.tree_util.tree_leaves(g0),
                            jax.tree_util.tree_leaves(g1)):
                np.testing.assert_allclose(np.asarray(b) / gmax,
                                           np.asarray(a) / gmax, atol=5e-4)
    finally:
        set_lane_core(False)


def test_autoint_model_parity():
    from tests.utils import get_test_data
    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import AutoInt

    x, y, cols = get_test_data(24, sparse_feature_num=3, dense_feature_num=1)
    y = np.asarray(y, np.float32)

    def loss_of(on):
        set_lane_attention(on)
        model = AutoInt(cols, cols, dnn_hidden_units=(8,), seed=4)
        model.compile("adam", "binary_crossentropy")
        xc = canonicalize_batch(x, model.feature_columns)
        model._ensure_built(xc)
        step = model._build_train_step()
        state, loss, _ = step(model.state, xc, y.reshape(-1, 1),
                              np.ones(len(y), np.float32),
                              jax.random.PRNGKey(0))
        return float(loss)

    assert abs(loss_of(False) - loss_of(True)) < 1e-5
