"""fit(steps_per_execution=K): K optimizer steps scanned inside one
compiled call (Keras steps_per_execution parity, tf.keras Model.compile).

Without dropout the parameter trajectory is deterministic, so the multi-step
driver must reproduce the single-step epoch losses exactly (incl. the
trailing remainder batches that run through the single-step program).
"""
import numpy as np

from deepctr_tpu.models import DeepFM

from tests.utils import get_test_data


def _fit(spe, epochs=2):
    x, y, feature_columns = get_test_data(
        sample_size=40, sparse_feature_num=2, dense_feature_num=1,
    )
    model = DeepFM(feature_columns, feature_columns, dnn_hidden_units=[4, 4],
                   dnn_dropout=0.0)
    model.compile("adam", "binary_crossentropy")
    hist = model.fit(x, y, batch_size=4, epochs=epochs, verbose=0,
                     shuffle=False, steps_per_execution=spe)
    return hist.history["loss"], model


def test_multi_step_matches_single_step():
    losses1, _ = _fit(1)
    # 40 rows / batch 4 = 10 steps; K=4 -> 2 scans + 2 trailing singles
    losses4, _ = _fit(4)
    np.testing.assert_allclose(losses1, losses4, rtol=1e-5)


def test_exact_divisor():
    losses1, _ = _fit(1, epochs=1)
    losses5, m = _fit(5, epochs=1)
    np.testing.assert_allclose(losses1, losses5, rtol=1e-5)
    # model still predicts after multi-step training (state intact)
    x, y, _ = get_test_data(sample_size=8, sparse_feature_num=2,
                            dense_feature_num=1)
    preds = m.predict(x, batch_size=4)
    assert preds.shape == (8, 1)
    assert np.isfinite(preds).all()


def test_sparse_engine_multi_step():
    x, y, feature_columns = get_test_data(
        sample_size=24, sparse_feature_num=3, dense_feature_num=1,
    )
    model = DeepFM(feature_columns, feature_columns, dnn_hidden_units=[4, 4],
                   dnn_dropout=0.0)
    model.compile("adam", sparse_embedding_updates=True)
    h = model.fit(x, y, batch_size=4, epochs=1, verbose=0, shuffle=False,
                  steps_per_execution=3)
    ref = DeepFM(feature_columns, feature_columns, dnn_hidden_units=[4, 4],
                 dnn_dropout=0.0)
    ref.compile("adam", sparse_embedding_updates=True)
    h1 = ref.fit(x, y, batch_size=4, epochs=1, verbose=0, shuffle=False)
    np.testing.assert_allclose(h.history["loss"], h1.history["loss"],
                               rtol=1e-5)
