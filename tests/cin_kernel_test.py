"""CIN Pallas kernel (ops/cin_kernel.py): the (B*D, F0*Fk) outer-product
intermediate lives only in VMEM. Interpret mode on CPU; forward bit-exact
vs the einsum, grads to f32 contraction noise."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepctr_tpu.ops.cin_kernel import (cin_layer, cin_supported,
                                        set_cin_kernel)


@pytest.fixture(autouse=True)
def _restore():
    yield
    set_cin_kernel(None)


@pytest.mark.parametrize("B,F0,Fk,D,S", [
    (64, 26, 13, 16, 128),   # criteo split_half shape class
    (32, 6, 6, 4, 16),       # tiny
    (16, 26, 26, 8, 64),     # first layer (Fk = F0)
])
def test_kernel_matches_einsum(B, F0, Fk, D, S):
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, F0, D).astype(np.float32))
    h = jnp.asarray(rng.randn(B, Fk, D).astype(np.float32))
    W = jnp.asarray(rng.randn(F0, Fk, S).astype(np.float32) * 0.1)
    want = jnp.einsum("bfd,bgd,fgs->bsd", x0, h, W)
    got = cin_layer(x0, h, W, interpret=True)
    # f32 contraction-order noise only (einsum picks its own path)
    s = max(float(jnp.abs(want).max()), 1.0)
    np.testing.assert_allclose(np.asarray(got) / s, np.asarray(want) / s,
                               atol=2e-6)

    ct = jnp.asarray(rng.randn(*want.shape).astype(np.float32))
    g_ref = jax.grad(lambda a, b, w: (jnp.einsum(
        "bfd,bgd,fgs->bsd", a, b, w) * ct).sum(),
        argnums=(0, 1, 2))(x0, h, W)
    g_k = jax.grad(lambda a, b, w: (cin_layer(a, b, w, True) * ct).sum(),
                   argnums=(0, 1, 2))(x0, h, W)
    for a, b in zip(g_ref, g_k):
        s = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(np.asarray(b) / s, np.asarray(a) / s,
                                   atol=3e-6)


def test_gate():
    assert cin_supported(26, 26, 128, 32768 * 16)
    assert not cin_supported(64, 64, 128, 32768 * 16)   # z rows too many
    assert not cin_supported(26, 13, 128, 100)          # no block divisor


def test_xdeepfm_model_parity():
    """Whole-model: CIN-kernel loss == einsum loss (bit-identical fwd)."""
    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import xDeepFM

    rng = np.random.RandomState(0)
    B = 32  # B*D divisible by 128 so the kernel actually routes
    cols = [SparseFeat("c%d" % i, 20, 4) for i in range(6)] + \
        [DenseFeat("d0", 1)]
    x = {("c%d" % i): rng.randint(0, 20, B) for i in range(6)}
    x["d0"] = rng.rand(B).astype("float32")
    y = rng.randint(0, 2, B).astype(np.float32)

    def loss_of(on):
        set_cin_kernel(on, interpret=on)
        m = xDeepFM(cols, cols, dnn_hidden_units=(8,),
                    cin_layer_size=(16, 16), seed=6)
        m.compile("adam", "binary_crossentropy")
        xc = canonicalize_batch(x, m.feature_columns)
        m._ensure_built(xc)
        step = m._build_train_step()
        _, loss, _ = step(m.state, xc, y.reshape(-1, 1),
                          np.ones(B, np.float32), jax.random.PRNGKey(0))
        return float(loss)

    assert loss_of(False) == loss_of(True)
