"""tf.feature_column migration shim (deepctr_tpu/feature_column.py).

Reference estimator users build native tf.feature_column objects
(ref examples/run_estimator_pandas_classification.py:32-38,
ref estimator/feature_column.py:7-45 consumes them). The shim's factories
must convert to framework specs with the same semantics at every factory
entry point — model tier and estimator tier.
"""
import numpy as np
import pandas as pd
import pytest

from deepctr_tpu import DenseFeat, SparseFeat
from deepctr_tpu import feature_column as fc


def test_module_reexports_reference_names():
    # reference `deepctr.feature_column` import surface
    assert fc.SparseFeat is SparseFeat
    assert fc.DenseFeat is DenseFeat
    assert fc.build_input_features is fc.build_input_schema


def test_identity_and_embedding_conversion():
    ident = fc.categorical_column_with_identity("C1", 100)
    emb = fc.embedding_column(ident, 8, trainable=False)
    out = fc.to_feature_columns([ident, emb])
    assert out[0] == SparseFeat("C1", 100, embedding_dim=1)
    assert isinstance(out[1], SparseFeat)
    assert (out[1].vocabulary_size, out[1].embedding_dim,
            out[1].trainable) == (100, 8, False)


def test_hash_bucket_and_numeric_conversion():
    hashed = fc.embedding_column(
        fc.categorical_column_with_hash_bucket("site", 50), 4)
    norm = lambda x: x * 0.5  # noqa: E731
    num = fc.numeric_column("I1", shape=(3,), normalizer_fn=norm)
    s, d = fc.to_feature_columns([hashed, num])
    assert s.use_hash and s.vocabulary_size == 50 and s.dtype == "string"
    assert d == DenseFeat("I1", 3, transform_fn=norm) and d.dimension == 3


def test_vocabulary_file_conversion(tmp_path):
    vocab = tmp_path / "v.txt"
    vocab.write_text("apple\nbanana\ncherry\n")
    col = fc.embedding_column(
        fc.categorical_column_with_vocabulary_file("fruit", str(vocab)), 4)
    (s,) = fc.to_feature_columns([col])
    assert s.use_hash and s.vocabulary_path == str(vocab)
    assert s.vocabulary_size == 4  # 3 entries + OOV/default row

def test_tf_initializer_object_rejected_with_guidance():
    class _FakeTFInit:  # stands in for tf.keras.initializers.TruncatedNormal
        pass
    _FakeTFInit.__module__ = "keras.initializers"
    ident = fc.categorical_column_with_identity("C1", 10)
    with pytest.raises(ValueError, match="declarative spec"):
        fc.embedding_column(ident, 4, initializer=_FakeTFInit())
    # declarative tuple spec reproduces the TF estimator-tier default
    col = fc.embedding_column(ident, 4,
                              initializer=("truncated_normal", 0.0, 0.5))
    (s,) = fc.to_feature_columns([col])
    assert s.embeddings_initializer == ("truncated_normal", 0.0, 0.5)


def test_vocabulary_list_raises_with_guidance():
    with pytest.raises(NotImplementedError, match="vocabulary_file"):
        fc.categorical_column_with_vocabulary_list("x", ["a", "b"])


def test_mixed_list_passthrough():
    native = SparseFeat("C9", 10, 4)
    out = fc.to_feature_columns(
        [native, fc.numeric_column("I9")])
    assert out[0] is native and isinstance(out[1], DenseFeat)


def _tf_style_columns(n_rows):
    """The reference estimator example's column-building pattern."""
    rng = np.random.RandomState(0)
    data = pd.DataFrame({
        "C1": rng.randint(0, 20, n_rows),
        "C2": rng.randint(0, 30, n_rows),
        "I1": rng.rand(n_rows).astype("float32"),
        "label": rng.randint(0, 2, n_rows),
    })
    linear_cols, dnn_cols = [], []
    for feat, vocab in (("C1", 20), ("C2", 30)):
        ident = fc.categorical_column_with_identity(feat, vocab)
        linear_cols.append(ident)
        dnn_cols.append(fc.embedding_column(ident, 4))
    for feat in ("I1",):
        linear_cols.append(fc.numeric_column(feat))
        dnn_cols.append(fc.numeric_column(feat))
    return data, linear_cols, dnn_cols


def test_model_factory_accepts_tf_style_columns(tmp_path):
    from deepctr_tpu import load_model, save_model
    from deepctr_tpu.models import DeepFM

    data, linear_cols, dnn_cols = _tf_style_columns(64)
    model = DeepFM(linear_cols, dnn_cols, dnn_hidden_units=(8, 4))
    # the factory converted on entry: only framework specs recorded
    assert all(isinstance(c, (SparseFeat, DenseFeat))
               for c in model.feature_columns)
    x = {k: data[k].values for k in ("C1", "C2", "I1")}
    y = data["label"].values.astype("float32")
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=32, epochs=1, verbose=0)
    p1 = model.predict(x, batch_size=32)

    path = str(tmp_path / "m.dctpu")
    save_model(model, path)  # build spec holds converted specs
    p2 = load_model(path).predict(x, batch_size=32)
    np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-6)


def test_estimator_accepts_tf_style_columns():
    from deepctr_tpu.estimator import DeepFMEstimator, input_fn_pandas

    data, linear_cols, dnn_cols = _tf_style_columns(64)
    est = DeepFMEstimator(linear_cols, dnn_cols, task="binary")
    est.train(input_fn_pandas(data, ["C1", "C2", "I1"], "label",
                              batch_size=32))
    preds = list(est.predict(
        input_fn_pandas(data, ["C1", "C2", "I1"], None, shuffle=False,
                        batch_size=32)))
    assert len(preds) == 64
    assert all(0.0 <= p["pred"] <= 1.0 for p in preds)


def test_hashed_string_feature_end_to_end():
    from deepctr_tpu.models import DeepFM

    rng = np.random.RandomState(1)
    words = np.array(["w%d" % i for i in range(40)])
    x = {"site": words[rng.randint(0, 40, 64)],
         "I1": rng.rand(64).astype("float32")}
    y = rng.randint(0, 2, 64).astype("float32")
    cols = [fc.embedding_column(
        fc.categorical_column_with_hash_bucket("site", 100), 4),
        fc.numeric_column("I1")]
    model = DeepFM(cols, cols, dnn_hidden_units=(8,))
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=32, epochs=1, verbose=0)
    assert np.isfinite(model.predict(x, batch_size=32)).all()
