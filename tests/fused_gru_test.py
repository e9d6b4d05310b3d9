"""Fused whole-sequence GRU kernel (ops/gru.py) vs the lax.scan path.

Interpret mode on CPU: same math, so values AND gradients must match the
scan to float32 tolerance for every cell type and ragged lengths.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepctr_tpu.layers import sequence as S
from deepctr_tpu.ops import gru as G

B, T, E, U = 5, 7, 12, 10  # deliberately non-multiples of 8


def _fixture(seed=0, with_att=True):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lengths = jnp.asarray(rng.randint(1, T + 1, (B, 1)).astype(np.int32))
    att = (jnp.asarray(rng.rand(B, T, 1).astype(np.float32))
           if with_att else None)
    return x, lengths, att


def _params(seed=1):
    rng = np.random.RandomState(seed)
    return {
        "gate_kernel": jnp.asarray(
            rng.standard_normal((E + U, 2 * U)).astype(np.float32) * 0.3),
        "gate_bias": jnp.asarray(np.ones(2 * U, np.float32)),
        "candidate_kernel": jnp.asarray(
            rng.standard_normal((E + U, U)).astype(np.float32) * 0.3),
        "candidate_bias": jnp.asarray(np.zeros(U, np.float32)),
    }


def _apply(gru_type, x, lengths, att, params, fused):
    mod = S._GRUScan(U, gru_type)
    variables = {"params": params}
    if fused:
        G.set_fused_gru(True, interpret=True)
    try:
        out, final = mod.apply(variables, x, lengths=lengths, att_scores=att)
    finally:
        G.set_fused_gru(False)
    return out, final


@pytest.mark.parametrize("gru_type", ["GRU", "AGRU", "AUGRU"])
def test_fused_gru_forward_parity(gru_type):
    x, lengths, att = _fixture()
    params = _params()
    ref_out, ref_fin = _apply(gru_type, x, lengths, att, params, fused=False)
    out, fin = _apply(gru_type, x, lengths, att, params, fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fin), np.asarray(ref_fin),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gru_type", ["GRU", "AGRU", "AUGRU"])
def test_fused_gru_gradient_parity(gru_type):
    x, lengths, att = _fixture(2)
    params = _params(3)

    def loss(params, x, att, fused):
        out, final = _apply(gru_type, x, lengths, att, params, fused)
        # weights exercise every output position + the final state
        w_out = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return jnp.sum(out * w_out) + 2.0 * jnp.sum(final ** 2)

    grads_ref = jax.grad(loss, argnums=(0, 1, 2))(params, x, att, False)
    grads_fused = jax.grad(loss, argnums=(0, 1, 2))(params, x, att, True)
    for g_ref, g_f in zip(jax.tree.leaves(grads_ref),
                          jax.tree.leaves(grads_fused)):
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)


def test_fused_gru_no_lengths_no_att():
    x, _, _ = _fixture(4, with_att=False)
    params = _params(5)
    ref_out, ref_fin = _apply("GRU", x, None, None, params, fused=False)
    out, fin = _apply("GRU", x, None, None, params, fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fin), np.asarray(ref_fin),
                               rtol=1e-5, atol=1e-5)


def test_fused_gru_supported_gate():
    assert G.fused_gru_supported(50, 16, 16)
    assert not G.fused_gru_supported(100_000, 128, 128)


def test_dien_model_with_fused_gru_matches_scan():
    """Model-level: DIEN AUGRU losses identical with the kernel routed in."""
    from tests.models.DIEN_test import get_xy_fd

    from deepctr_tpu.models import DIEN

    x, y, cols, behaviors = get_xy_fd(use_neg=True)

    def run(fused):
        model = DIEN(cols, behaviors, gru_type="AUGRU", use_negsampling=True,
                     dnn_hidden_units=(8, 4), seed=1024)
        model.compile("adam", "binary_crossentropy", fused_gru=fused)
        h = model.fit(x, y, batch_size=4, epochs=2, shuffle=False, verbose=0)
        G.set_fused_gru(False)
        return h.history["loss"]

    ref = run(False)
    fused = run(True)
    np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("gru_type", ["GRU", "AUGRU"])
def test_fused_gru_multi_block_grid(monkeypatch, gru_type):
    """B > _BT exercises the batch grid: per-block weight-grad partials
    must sum to the scan's gradients."""
    monkeypatch.setattr(G, "_pick_bt", lambda T, E, U: 8)  # tiny lane blocks
    rng = np.random.RandomState(7)
    Bb = 20  # 3 blocks of 8 after padding
    x = jnp.asarray(rng.standard_normal((Bb, T, E)).astype(np.float32))
    lengths = jnp.asarray(rng.randint(1, T + 1, (Bb, 1)).astype(np.int32))
    att = jnp.asarray(rng.rand(Bb, T, 1).astype(np.float32))
    params = _params(8)

    def loss(params, x, att, fused):
        mod = S._GRUScan(U, gru_type)
        if fused:
            G.set_fused_gru(True, interpret=True)
        try:
            out, final = mod.apply({"params": params}, x, lengths=lengths,
                                   att_scores=att)
        finally:
            G.set_fused_gru(False)
        return jnp.sum(out ** 2) + jnp.sum(final)

    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0,))(params, x, att, False)
    v_f, g_f = jax.value_and_grad(loss, argnums=(0,))(params, x, att, True)
    np.testing.assert_allclose(float(v_f), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("gru_type", ["GRU", "AIGRU", "AGRU", "AUGRU"])
def test_dien_all_gru_types_train_with_fused_kernel(gru_type):
    """Every DynamicGRU mode trains through the kernel (AIGRU scales the
    inputs by attention then runs plain GRU — same routing)."""
    from tests.models.DIEN_test import get_xy_fd

    from deepctr_tpu.models import DIEN

    x, y, cols, behaviors = get_xy_fd()
    try:
        model = DIEN(cols, behaviors, gru_type=gru_type,
                     dnn_hidden_units=(8, 4), seed=1024)
        model.compile("adam", "binary_crossentropy", fused_gru=True)
        h = model.fit(x, y, batch_size=3, epochs=2, shuffle=False, verbose=0)
        assert np.isfinite(h.history["loss"]).all()
    finally:
        G.set_fused_gru(False)
