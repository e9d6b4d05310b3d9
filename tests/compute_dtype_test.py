"""Mixed-precision (compute_dtype="bfloat16") coverage.

Master weights must stay f32, predictions f32 and finite, training must
converge like f32 (CTR losses are noise-tolerant at bf16 activation
precision), and the flag must compose with bf16 table storage and the
sparse embedding engine. Quality gate: DeepFM on the bundled criteo
sample reaches the f32 golden within the quality_test tolerance.
"""
import numpy as np
import pytest

from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat
from deepctr_tpu.models import AutoInt, DeepFM

from .utils import get_test_data


def _tabular(n=512, seed=0):
    rng = np.random.RandomState(seed)
    cols = [SparseFeat("C%d" % i, 1000, 16) for i in range(8)] + [
        DenseFeat("I0", 1)
    ]
    x = {"C%d" % i: rng.randint(0, 1000, (n,)) for i in range(8)}
    x["I0"] = rng.rand(n).astype(np.float32)
    y = rng.randint(0, 2, n).astype(np.float32)
    return cols, x, y


def test_bf16_compute_trains_and_predicts_f32():
    cols, x, y = _tabular()
    m = DeepFM(cols, cols)
    m.compile("adam", "binary_crossentropy", compute_dtype="bfloat16")
    h = m.fit(x, y, batch_size=128, epochs=3, verbose=0)
    assert h.history["loss"][-1] < h.history["loss"][0]
    # master weights stay f32
    import jax

    for leaf in jax.tree.leaves(m.state.params):
        assert leaf.dtype == np.float32
    p = m.predict(x, batch_size=128)
    assert p.dtype == np.float32
    assert np.isfinite(p).all()


def test_bf16_compute_matches_f32_losses():
    cols, x, y = _tabular()
    m32 = DeepFM(cols, cols, seed=7)
    m32.compile("adam", "binary_crossentropy")
    h32 = m32.fit(x, y, batch_size=128, epochs=3, verbose=0)
    m16 = DeepFM(cols, cols, seed=7)
    m16.compile("adam", "binary_crossentropy", compute_dtype="bfloat16")
    h16 = m16.fit(x, y, batch_size=128, epochs=3, verbose=0)
    # same seed, same data: per-epoch losses must track within bf16 noise
    np.testing.assert_allclose(
        h16.history["loss"], h32.history["loss"], atol=5e-3
    )


def test_bf16_compute_attention_model():
    cols, x, y = _tabular(seed=1)
    m = AutoInt(cols, cols)
    m.compile("adam", "binary_crossentropy", compute_dtype="bfloat16")
    h = m.fit(x, y, batch_size=128, epochs=3, verbose=0)
    assert h.history["loss"][-1] < h.history["loss"][0]


def test_bf16_compute_survives_save_load(tmp_path):
    from deepctr_tpu import load_model, save_model

    cols, x, y = _tabular(seed=4)
    m = DeepFM(cols, cols)
    m.compile("adam", "binary_crossentropy", compute_dtype="bfloat16")
    m.fit(x, y, batch_size=128, epochs=2, verbose=0)
    p = m.predict(x, batch_size=128)
    path = str(tmp_path / "mp_model")
    save_model(m, path)
    m2 = load_model(path)
    # the loaded model must predict in the SAME compute dtype (a silent
    # f32 fallback differs at bf16 rounding level — caught by /verify)
    assert m2.compute_dtype == "bfloat16"
    np.testing.assert_allclose(p, m2.predict(x, batch_size=128), rtol=1e-5)


def test_bf16_compute_composes_with_tables_and_sparse_engine():
    cols, x, y = _tabular(seed=2)
    m = DeepFM(cols, cols)
    m.compile(
        "adam",
        "binary_crossentropy",
        sparse_embedding_updates=True,
        embedding_dtype="bfloat16",
        compute_dtype="bfloat16",
    )
    h = m.fit(x, y, batch_size=128, epochs=3, verbose=0)
    assert h.history["loss"][-1] < h.history["loss"][0]
    p = m.predict(x, batch_size=128)
    assert np.isfinite(p).all()


def test_bf16_compute_varlen_sequence():
    rng = np.random.RandomState(3)
    B, T = 256, 10
    feats = [
        SparseFeat("item", 100, 8),
        VarLenSparseFeat(
            SparseFeat("hist_item", 100, 8, embedding_name="item"),
            T,
            length_name="seq_length",
        ),
    ]
    x = {
        "item": rng.randint(0, 100, B),
        "hist_item": rng.randint(0, 100, (B, T)),
        "seq_length": rng.randint(1, T + 1, B),
    }
    y = rng.randint(0, 2, B).astype(np.float32)
    m = DeepFM(feats, feats)
    m.compile("adam", "binary_crossentropy", compute_dtype="bfloat16")
    h = m.fit(x, y, batch_size=64, epochs=3, verbose=0)
    assert h.history["loss"][-1] < h.history["loss"][0]


def test_bf16_compute_multitask():
    """Mixed precision through multi-task heads/gates (MMOE) with per-task
    losses stays f32 at the loss level and close to the f32 run."""
    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.models.multitask import MMOE

    rng = np.random.RandomState(3)
    cols = [SparseFeat("s%d" % i, 10, 4) for i in range(3)]
    cols += [DenseFeat("d0", 1)]
    n = 32
    x = {**{"s%d" % i: rng.randint(0, 10, n) for i in range(3)},
         "d0": rng.rand(n)}
    y = [rng.randint(0, 2, n).astype("float32"),
         rng.rand(n).astype("float32")]

    def run(cd):
        m = MMOE(cols, tower_dnn_hidden_units=(8,), num_experts=3,
                 task_types=("binary", "regression"),
                 task_names=("ctr", "ltv"), seed=1024)
        m.compile("adam", ["binary_crossentropy", "mse"], compute_dtype=cd)
        h = m.fit(x, y, batch_size=16, epochs=2, shuffle=False, verbose=0)
        return h.history["loss"]

    l32 = run(None)
    l16 = run("bfloat16")
    assert l16[-1] < l16[0]  # trains
    np.testing.assert_allclose(l16, l32, rtol=3e-2)


def test_auto_policy_selects_bf16_for_attention_models():
    """compute_dtype default (auto): attention/CIN graphs compile bf16,
    plain tabular graphs stay f32, explicit choices always win."""
    import jax.numpy as jnp
    import numpy as np

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.models import AutoInt, DeepFM

    cols = [SparseFeat("s%d" % i, 20, 4) for i in range(3)]
    cols += [DenseFeat("d0", 1)]
    rng = np.random.RandomState(0)
    x = {**{"s%d" % i: rng.randint(0, 20, 16) for i in range(3)},
         "d0": rng.rand(16).astype("float32")}
    y = rng.randint(0, 2, 16).astype("float32")

    m = DeepFM(cols, cols, dnn_hidden_units=(8,))
    m.compile("adam", "binary_crossentropy")
    m.fit(x, y, batch_size=8, epochs=1, verbose=0)
    assert jnp.dtype(m._resolved_compute_dtype()) == jnp.float32

    m = AutoInt(cols, cols, dnn_hidden_units=(8,))
    m.compile("adam", "binary_crossentropy")
    m.fit(x, y, batch_size=8, epochs=1, verbose=0)
    assert jnp.dtype(m._resolved_compute_dtype()) == jnp.bfloat16

    m = AutoInt(cols, cols, dnn_hidden_units=(8,))
    m.compile("adam", "binary_crossentropy", compute_dtype="float32")
    m.fit(x, y, batch_size=8, epochs=1, verbose=0)
    assert jnp.dtype(m._resolved_compute_dtype()) == jnp.float32
