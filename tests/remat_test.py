"""compile(remat=...): exact transformer rematerialization (BST/DSIN).

jax.checkpoint recomputes attention/FFN activations in the backward
instead of saving them — the losses must be BIT-equal to the plain path,
and weights must round-trip across remat settings (the lifted transform
is name-transparent). Measured +23% BST / +11% DSIN on v5e
(docs/Performance.md).
"""
from __future__ import annotations

import numpy as np

from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat
from deepctr_tpu.models import BST, DSIN


def _bst_fixture(n=32):
    rng = np.random.RandomState(0)
    cols = [
        SparseFeat("user", 10, 8),
        SparseFeat("item", 20, 8),
        DenseFeat("score", 1),
        VarLenSparseFeat(SparseFeat("hist_item", 20, 8,
                                    embedding_name="item"),
                         maxlen=6, length_name="seq_length"),
    ]
    x = {
        "user": rng.randint(0, 10, n),
        "item": rng.randint(1, 20, n),
        "score": rng.rand(n).astype(np.float32),
        "hist_item": rng.randint(1, 20, (n, 6)),
        "seq_length": rng.randint(1, 7, n),
    }
    y = rng.randint(0, 2, n).astype(np.float32)
    return cols, x, y


def _dsin_fixture(n=32):
    rng = np.random.RandomState(0)
    cols = [
        SparseFeat("user", 10, 8),
        SparseFeat("item", 20, 4),
        DenseFeat("score", 1),
        VarLenSparseFeat(SparseFeat("sess_0_item", 20, 4,
                                    embedding_name="item"), maxlen=4),
        VarLenSparseFeat(SparseFeat("sess_1_item", 20, 4,
                                    embedding_name="item"), maxlen=4),
    ]
    x = {
        "user": rng.randint(0, 10, n),
        "item": rng.randint(1, 20, n),
        "score": rng.rand(n).astype(np.float32),
        "sess_0_item": rng.randint(1, 20, (n, 4)),
        "sess_1_item": rng.randint(1, 20, (n, 4)),
        "sess_length": rng.randint(0, 3, n),
    }
    y = rng.randint(0, 2, n).astype(np.float32)
    return cols, x, y


def _losses(model_ctor, x, y, remat):
    model = model_ctor()
    model.compile("adam", "binary_crossentropy", remat=remat)
    hist = model.fit(x, y, batch_size=16, epochs=2, shuffle=False,
                     verbose=0)
    return model, hist.history["loss"]


def test_bst_remat_exact_loss_parity():
    cols, x, y = _bst_fixture()
    ctor = lambda: BST(cols, ["item"], att_head_num=2,
                       dnn_hidden_units=(8,), seed=7)
    _, base = _losses(ctor, x, y, remat=False)
    _, rem = _losses(ctor, x, y, remat=True)
    np.testing.assert_allclose(rem, base, rtol=1e-6)


def test_dsin_remat_exact_loss_parity():
    cols, x, y = _dsin_fixture()
    ctor = lambda: DSIN(cols, ["item"], sess_max_count=2,
                        att_embedding_size=2, att_head_num=2,
                        dnn_hidden_units=(8,), seed=7)
    _, base = _losses(ctor, x, y, remat=False)
    _, rem = _losses(ctor, x, y, remat=True)
    np.testing.assert_allclose(rem, base, rtol=1e-6)


def test_weights_roundtrip_across_remat_settings(tmp_path):
    """nn.remat is name-transparent: weights from a remat model load into
    a plain one (and back) with identical predictions."""
    cols, x, y = _bst_fixture()
    m1 = BST(cols, ["item"], att_head_num=2, dnn_hidden_units=(8,), seed=7)
    m1.compile("adam", remat=True)
    m1.fit(x, y, batch_size=16, epochs=1, verbose=0)
    p = str(tmp_path / "w.bin")
    m1.save_weights(p)
    m2 = BST(cols, ["item"], att_head_num=2, dnn_hidden_units=(8,), seed=9)
    m2.compile("adam", remat=False)
    m2.load_weights(p)
    np.testing.assert_allclose(m2.predict(x, batch_size=16),
                               m1.predict(x, batch_size=16),
                               rtol=1e-6, atol=1e-7)


def test_remat_with_dropout_trains():
    """dropout_rate > 0 exercises the static-training remat boundary
    (a traced ``training`` would crash nn.Dropout's deterministic flag)."""
    cols, x, y = _bst_fixture()
    model = BST(cols, ["item"], att_head_num=2, dnn_hidden_units=(8,),
                dnn_dropout=0.3, seed=7)
    model.compile("adam", remat=True)
    hist = model.fit(x, y, batch_size=16, epochs=1, verbose=0)
    assert np.isfinite(hist.history["loss"][0])
