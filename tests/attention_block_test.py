"""Blocked lane-major attention kernel (ops/attention_block.py).

The medium-T tier (BST's T=50): the XLA lane path's layout inside a
Pallas block so accumulators stay in VMEM. Interpret mode on CPU;
measured +26% on BST end-to-end on the TPU (BASELINE.md round 5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepctr_tpu.layers.sequence import Transformer
from deepctr_tpu.ops.attention_block import (block_attention,
                                             block_attention_supported,
                                             set_block_attention)

MASK = float(-(2.0 ** 32) + 1)


@pytest.fixture(autouse=True)
def _restore():
    yield
    set_block_attention(None)


def _ref(Q, K, V, km, qm, scale, blinding):
    scores = jnp.einsum("hdqb,hdkb->hqkb", Q, K) * scale
    scores = jnp.where(km[None, None, :, :] > 0, scores, MASK)
    if blinding:
        T_q, T_k = Q.shape[2], K.shape[2]
        eye = jnp.eye(T_q, T_k, dtype=bool)[None, :, :, None]
        scores = jnp.where(eye, MASK, scores)
    soft = jax.nn.softmax(scores, axis=2)
    w = soft * qm[None, :, None, :]
    return jnp.einsum("hqkb,hdkb->hdqb", w, V)


@pytest.mark.parametrize("blinding", [False, True])
def test_kernel_matches_reference(blinding):
    rng = np.random.RandomState(0)
    H, D, T, B = 4, 16, 50, 256
    Q, K, V = (jnp.asarray(rng.randn(H, D, T, B).astype(np.float32))
               for _ in range(3))
    lens = rng.randint(1, T + 1, B)
    km = jnp.asarray((np.arange(T)[:, None] < lens[None, :])
                     .astype(np.float32))
    qm = km
    scale = 1.0 / (D ** 0.5)
    want = _ref(Q, K, V, km, qm, scale, blinding)
    got = block_attention(Q, K, V, km, qm, scale, blinding, MASK, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    ct = jnp.asarray(rng.randn(*want.shape).astype(np.float32))
    g_ref = jax.grad(lambda *a: (_ref(*a, km, qm, scale, blinding)
                                 * ct).sum(), argnums=(0, 1, 2))(Q, K, V)
    g_k = jax.grad(lambda *a: (block_attention(
        *a, km, qm, scale, blinding, MASK, True) * ct).sum(),
        argnums=(0, 1, 2))(Q, K, V)
    for a, b in zip(g_ref, g_k):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)


def test_transformer_routes_and_matches():
    """BST-shape Transformer: block-kernel path == einsum path (values
    and grads, to contraction-order noise)."""
    rng = np.random.RandomState(1)
    B, T, D, H = 256, 50, 16, 4
    x = jnp.asarray(rng.randn(B, T, D * H).astype(np.float32))
    lens = jnp.asarray(rng.randint(1, T + 1, (B, 1)))

    def run(on):
        set_block_attention(on, interpret=on)
        tr = Transformer(D, H, dropout_rate=0.0, use_layer_norm=True,
                         blinding=False, output_type=None)
        p = tr.init(jax.random.PRNGKey(0), x, x,
                    query_lengths=lens, key_lengths=lens)
        out = tr.apply(p, x, x, query_lengths=lens, key_lengths=lens)
        g = jax.grad(lambda pp: (tr.apply(
            pp, x, x, query_lengths=lens, key_lengths=lens) ** 2).sum())(p)
        return out, g

    o0, g0 = run(False)
    o1, g1 = run(True)
    scale = max(float(jnp.abs(o0).max()), 1.0)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=5e-5 * scale, rtol=3e-4)
    gmax = max(float(jnp.abs(a).max())
               for a in jax.tree_util.tree_leaves(g0))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b) / gmax,
                                   np.asarray(a) / gmax, atol=5e-4)


def test_eligibility_and_dropout_fallback():
    assert block_attention_supported(50, 50, 16, 8192)      # BST
    assert block_attention_supported(26, 26, 8, 32768)      # AutoInt criteo
    assert not block_attention_supported(10, 10, 8, 8192)   # lane tier
    assert not block_attention_supported(100, 100, 16, 8192)
    assert not block_attention_supported(50, 50, 16, 100)   # no block div
    # training dropout falls back to the einsum path (different rng
    # consumption would otherwise change semantics): just verify the
    # model still runs with dropout on and the kernel forced
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(128, 50, 64).astype(np.float32))
    lens = jnp.asarray(rng.randint(1, 51, (128, 1)))
    set_block_attention(True, interpret=True)
    tr = Transformer(16, 4, dropout_rate=0.3, use_layer_norm=True,
                     blinding=False, output_type=None)
    p = tr.init(jax.random.PRNGKey(0), x, x,
                query_lengths=lens, key_lengths=lens)
    out = tr.apply(p, x, x, query_lengths=lens, key_lengths=lens,
                   training=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert bool(jnp.isfinite(out).all())
