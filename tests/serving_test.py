"""StableHLO serving artifacts: export -> load -> predict parity, batch
polymorphism, and independence from the live model object."""
from __future__ import annotations

import numpy as np

from deepctr_tpu import DenseFeat, SparseFeat, serving
from deepctr_tpu.features import canonicalize_batch
from deepctr_tpu.models import DeepFM


def _fixture(n=32, seed=0):
    rng = np.random.RandomState(seed)
    cols = [SparseFeat("s%d" % i, 20, 4) for i in range(3)]
    cols += [DenseFeat("d0", 1)]
    x = {**{"s%d" % i: rng.randint(0, 20, n) for i in range(3)},
         "d0": rng.rand(n).astype("float32")}
    y = rng.randint(0, 2, n).astype("float32")
    return cols, x, y


def test_export_load_predict_parity(tmp_path):
    cols, x, y = _fixture()
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)
    want = model.predict(x)

    path = str(tmp_path / "deepfm.shlo")
    size = serving.export_stablehlo(model, path, example_batch=x)
    assert size > 0

    got = serving.predict_with_artifact(path, x, cols)
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)


def test_polymorphic_batch_size(tmp_path):
    cols, x, y = _fixture()
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)

    path = str(tmp_path / "deepfm.shlo")
    serving.export_stablehlo(model, path, example_batch=x)
    serve = serving.load_stablehlo(path)

    # a different batch size through the same artifact
    cols2, x2, _ = _fixture(n=7, seed=3)
    out = np.asarray(serve(canonicalize_batch(x2, cols)))
    assert out.shape[0] == 7
    want = model.predict(x2)
    np.testing.assert_allclose(out.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)


def test_artifact_outlives_training(tmp_path):
    """Weights are baked in at export: training further does not change
    the artifact's predictions."""
    cols, x, y = _fixture()
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)

    path = str(tmp_path / "deepfm.shlo")
    serving.export_stablehlo(model, path, example_batch=x)
    before = serving.predict_with_artifact(path, x, cols)

    model.fit(x, y, batch_size=16, epochs=3, verbose=0)  # keep training
    after = serving.predict_with_artifact(path, x, cols)
    np.testing.assert_allclose(after, before, rtol=1e-6)
    # while the live model HAS moved
    assert not np.allclose(model.predict(x).reshape(-1),
                           before.reshape(-1), rtol=1e-4)
