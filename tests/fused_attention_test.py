"""Fused short-sequence attention kernel: interpret-mode parity vs the
plain-XLA reference (fwd + grads), across masks, blinding, dtypes, and
padding-triggering shapes."""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepctr_tpu.ops.attention import fused_attention, reference_attention


def _data(B, H, T, D, dtype=jnp.float32, seed=0, full_lens=False):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), dtype)
    if full_lens:
        mask = jnp.ones((B, T), jnp.float32)
    else:
        lens = rng.randint(1, T + 1, (B,))
        mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None])
                           .astype(np.float32))
    return q, k, v, mask


@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("blinding", [True, False])
def test_forward_parity(masked, blinding):
    q, k, v, mask = _data(6, 2, 10, 8)
    km = mask if masked else None
    out = fused_attention(q, k, v, km, scale=1 / np.sqrt(8),
                          blinding=blinding, interpret=True)
    ref = reference_attention(q, k, v, km, scale=1 / np.sqrt(8),
                              blinding=blinding)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grad_parity():
    q, k, v, mask = _data(4, 2, 12, 8, seed=3)

    def loss(fn, *args):
        return lambda qkv: (fn(qkv[0], qkv[1], qkv[2], mask,
                               scale=0.25, blinding=True, *args) ** 2).sum()

    g_fused = jax.grad(lambda qkv: (
        fused_attention(qkv[0], qkv[1], qkv[2], mask, scale=0.25,
                        blinding=True, interpret=True) ** 2).sum())((q, k, v))
    g_ref = jax.grad(lambda qkv: (
        reference_attention(qkv[0], qkv[1], qkv[2], mask, scale=0.25,
                            blinding=True) ** 2).sum())((q, k, v))
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_grad_parity_unmasked_unscaled():
    # AutoInt's InteractingLayer pattern: no mask, no scaling
    q, k, v, _ = _data(4, 2, 26, 8, seed=4, full_lens=True)
    g_fused = jax.grad(lambda qkv: (
        fused_attention(qkv[0], qkv[1], qkv[2], None,
                        interpret=True) ** 2).sum())((q, k, v))
    g_ref = jax.grad(lambda qkv: (
        reference_attention(qkv[0], qkv[1], qkv[2], None) ** 2).sum())(
            (q, k, v))
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_padding_shapes():
    # T=7 (sublane pad), B*H=10 (block pad): padded rows/keys must not leak
    q, k, v, mask = _data(5, 2, 7, 4, seed=5)
    out = fused_attention(q, k, v, mask, scale=0.5, interpret=True)
    ref = reference_attention(q, k, v, mask, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g = jax.grad(lambda qq: (
        fused_attention(qq, k, v, mask, scale=0.5,
                        interpret=True) ** 2).sum())(q)
    gr = jax.grad(lambda qq: (
        reference_attention(qq, k, v, mask, scale=0.5) ** 2).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_bf16_io():
    q, k, v, mask = _data(4, 2, 8, 8, dtype=jnp.bfloat16, seed=6)
    out = fused_attention(q, k, v, mask, scale=0.35, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = reference_attention(q, k, v, mask, scale=0.35)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_no_nan_on_fully_masked_rows():
    q, k, v, mask = _data(4, 2, 8, 8, seed=7)
    mask = mask.at[0].set(0.0)  # one example with zero valid keys
    out = fused_attention(q, k, v, mask, scale=0.3, interpret=True)
    assert not bool(jnp.isnan(out).any())


class TestFusedAttentionFunnelIntegration:
    """compile(fused_attention=True) routes Transformer (BST) and
    InteractingLayer (AutoInt) through the Pallas kernel with model-level
    parity."""

    def _seq_fixture(self, seed=0, n=24, maxlen=6):
        from deepctr_tpu import SparseFeat, VarLenSparseFeat

        rng = np.random.RandomState(seed)
        cols = [
            SparseFeat("item", 40, 16),
            SparseFeat("cate", 12, 16),
            VarLenSparseFeat(SparseFeat("hist_item", 40, 16,
                                        embedding_name="item"),
                             maxlen=maxlen, length_name="seq_length"),
            VarLenSparseFeat(SparseFeat("hist_cate", 12, 16,
                                        embedding_name="cate"),
                             maxlen=maxlen, length_name="seq_length"),
        ]
        x = {
            "item": rng.randint(1, 40, n),
            "cate": rng.randint(1, 12, n),
            "hist_item": rng.randint(1, 40, (n, maxlen)),
            "hist_cate": rng.randint(1, 12, (n, maxlen)),
            "seq_length": rng.randint(1, maxlen + 1, n),
        }
        y = rng.randint(0, 2, n).astype("float32")
        return cols, x, y

    def _run(self, make_model, x, y, fused):
        from deepctr_tpu.ops.attention import set_fused_attention

        try:
            model = make_model()
            # kernel-vs-XLA parity is an f32 contract; the auto policy
            # would otherwise compile these attention models bf16
            model.compile("adam", "binary_crossentropy",
                          fused_attention=fused, compute_dtype="float32")
            h = model.fit(x, y, batch_size=8, epochs=2, shuffle=False,
                          verbose=0)
            return h.history["loss"], model.predict(x)
        finally:
            set_fused_attention(False)

    def test_bst_parity_fused_vs_xla(self):
        from deepctr_tpu.models import BST

        cols, x, y = self._seq_fixture()
        make = lambda: BST(cols, ["item", "cate"], att_head_num=2,
                           dnn_hidden_units=(8,), seed=1024)
        l0, p0 = self._run(make, x, y, False)
        l1, p1 = self._run(make, x, y, True)
        np.testing.assert_allclose(l1, l0, rtol=2e-4)
        np.testing.assert_allclose(p1, p0, rtol=2e-4, atol=1e-6)

    def test_autoint_parity_fused_vs_xla(self):
        from deepctr_tpu import DenseFeat, SparseFeat
        from deepctr_tpu.models import AutoInt

        rng = np.random.RandomState(1)
        cols = [SparseFeat("s%d" % i, 20, 8) for i in range(5)]
        cols += [DenseFeat("d0", 1)]
        n = 24
        x = {**{"s%d" % i: rng.randint(0, 20, n) for i in range(5)},
             "d0": rng.rand(n)}
        y = rng.randint(0, 2, n).astype("float32")
        make = lambda: AutoInt(cols, cols, att_layer_num=2, att_head_num=2,
                               dnn_hidden_units=(8,), seed=1024)
        l0, p0 = self._run(make, x, y, False)
        l1, p1 = self._run(make, x, y, True)
        np.testing.assert_allclose(l1, l0, rtol=2e-4)
        np.testing.assert_allclose(p1, p0, rtol=2e-4, atol=1e-6)


def test_grad_parity_degenerate_rows():
    """Length-1 histories + blinding fully mask a query row: softmax is
    uniform there and the XLA where() blocks those grads — kernel must too."""
    q, k, v, _ = _data(4, 2, 8, 8, seed=11, full_lens=True)
    mask = jnp.zeros((4, 8), jnp.float32).at[:, 0].set(1.0)  # len = 1
    g_fused = jax.grad(lambda qkv: (
        fused_attention(qkv[0], qkv[1], qkv[2], mask, scale=0.3,
                        blinding=True, interpret=True) ** 2).sum())((q, k, v))
    g_ref = jax.grad(lambda qkv: (
        reference_attention(qkv[0], qkv[1], qkv[2], mask, scale=0.3,
                            blinding=True) ** 2).sum())((q, k, v))
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_dsin_parity_fused_vs_xla():
    """DSIN's per-session Transformer (with BiasEncoding + sess masks)
    through the fused kernel matches the XLA path."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from models.DSIN_test import get_xy_fd

    from deepctr_tpu.models import DSIN
    from deepctr_tpu.ops.attention import set_fused_attention

    x, y, cols, behaviors = get_xy_fd()

    def run(fused):
        try:
            m = DSIN(cols, behaviors, sess_max_count=2, bias_encoding=True,
                     dnn_hidden_units=(8,), att_embedding_size=4,
                     att_head_num=2, seed=1024)
            m.compile("adam", "binary_crossentropy", fused_attention=fused)
            h = m.fit(x, y, batch_size=3, epochs=2, shuffle=False, verbose=0)
            return h.history["loss"], m.predict(x)
        finally:
            set_fused_attention(False)

    l0, p0 = run(False)
    l1, p1 = run(True)
    np.testing.assert_allclose(l1, l0, rtol=2e-4)
    np.testing.assert_allclose(p1, p0, rtol=2e-4, atol=1e-6)


def test_long_t_falls_back_to_xla():
    """T beyond the VMEM tile budget must serve through the XLA path
    (identical numerics), not fail."""
    from deepctr_tpu.ops.attention import fused_attention_supported

    assert fused_attention_supported(50, 8)
    assert not fused_attention_supported(128, 8)
    q, k, v, mask = _data(2, 2, 128, 8, seed=9)
    out = fused_attention(q, k, v, mask, scale=0.25, interpret=True)
    ref = reference_attention(q, k, v, mask, scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


class TestInKernelDropout:
    def test_zero_rate_matches_no_dropout_exactly(self):
        q, k, v, mask = _data(4, 2, 10, 8, seed=21)
        a = fused_attention(q, k, v, mask, scale=0.3, interpret=True)
        b = fused_attention(q, k, v, mask, scale=0.3, dropout_rate=0.0,
                            dropout_seed=7, interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_deterministic_per_seed(self):
        q, k, v, mask = _data(4, 2, 10, 8, seed=22)
        f = lambda s: fused_attention(q, k, v, mask, scale=0.3,
                                      dropout_rate=0.4, dropout_seed=s,
                                      interpret=True)
        np.testing.assert_array_equal(np.asarray(f(5)), np.asarray(f(5)))
        assert not np.allclose(np.asarray(f(5)), np.asarray(f(6)))

    def test_unbiased_mean_over_seeds(self):
        q, k, v, mask = _data(2, 1, 8, 4, seed=23)
        base = np.asarray(fused_attention(q, k, v, mask, scale=0.5,
                                          interpret=True))
        acc = np.zeros_like(base)
        n = 120
        for s in range(n):
            acc += np.asarray(fused_attention(
                q, k, v, mask, scale=0.5, dropout_rate=0.3,
                dropout_seed=1000 + s, interpret=True))
        # E[dropout(W)] = W -> the mean output converges to the base
        np.testing.assert_allclose(acc / n, base, atol=0.15)

    def test_grads_self_consistent_fixed_seed(self):
        from jax.test_util import check_grads

        q, k, v, mask = _data(2, 2, 8, 4, seed=24)
        f = lambda q, k, v: fused_attention(
            q, k, v, mask, scale=0.5, blinding=True, dropout_rate=0.35,
            dropout_seed=9, interpret=True).sum()
        # custom-VJP grads vs finite differences of the SAME fwd fn
        check_grads(f, (q, k, v), order=1, modes=["rev"],
                    atol=5e-2, rtol=5e-2)

    def test_bst_trains_with_attention_dropout_fused(self):
        from deepctr_tpu import SparseFeat, VarLenSparseFeat
        from deepctr_tpu.models import BST
        from deepctr_tpu.ops.attention import set_fused_attention

        rng = np.random.RandomState(0)
        maxlen, n = 6, 48
        cols = [SparseFeat("item", 30, 16), SparseFeat("cate", 8, 16),
                VarLenSparseFeat(SparseFeat("hist_item", 30, 16,
                                            embedding_name="item"),
                                 maxlen=maxlen, length_name="seq_length"),
                VarLenSparseFeat(SparseFeat("hist_cate", 8, 16,
                                            embedding_name="cate"),
                                 maxlen=maxlen, length_name="seq_length")]
        x = {"item": rng.randint(1, 30, n), "cate": rng.randint(1, 8, n),
             "hist_item": rng.randint(1, 30, (n, maxlen)),
             "hist_cate": rng.randint(1, 8, (n, maxlen)),
             "seq_length": rng.randint(1, maxlen + 1, n)}
        y = rng.randint(0, 2, n).astype("float32")
        try:
            m = BST(cols, ["item", "cate"], att_head_num=2,
                    dnn_hidden_units=(8,), dnn_dropout=0.3, seed=5)
            m.compile("adam", "binary_crossentropy", fused_attention=True)
            h = m.fit(x, y, batch_size=16, epochs=3, shuffle=False,
                      verbose=0)
            assert h.history["loss"][-1] < h.history["loss"][0]
            p = m.predict(x)
            assert not np.isnan(p).any()
        finally:
            set_fused_attention(False)


def test_autoint_fused_plus_mixed_precision():
    """The recommended production combo — compute_dtype=bf16 activations
    feeding the fused kernel (bf16 Q/K/V io) — trains and stays close to
    the XLA bf16 path."""
    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.models import AutoInt
    from deepctr_tpu.ops.attention import set_fused_attention

    rng = np.random.RandomState(2)
    cols = [SparseFeat("s%d" % i, 20, 8) for i in range(5)]
    cols += [DenseFeat("d0", 1)]
    n = 24
    x = {**{"s%d" % i: rng.randint(0, 20, n) for i in range(5)},
         "d0": rng.rand(n)}
    y = rng.randint(0, 2, n).astype("float32")

    def run(fused):
        try:
            m = AutoInt(cols, cols, att_layer_num=2, att_head_num=2,
                        dnn_hidden_units=(8,), seed=1024)
            m.compile("adam", "binary_crossentropy",
                      compute_dtype="bfloat16", fused_attention=fused)
            h = m.fit(x, y, batch_size=8, epochs=2, shuffle=False, verbose=0)
            return h.history["loss"], m.predict(x)
        finally:
            set_fused_attention(False)

    l0, p0 = run(False)
    l1, p1 = run(True)
    # both paths are bf16; small divergence is expected, blowups are not
    np.testing.assert_allclose(l1, l0, rtol=2e-2)
    np.testing.assert_allclose(p1, p0, rtol=3e-2, atol=3e-2)
