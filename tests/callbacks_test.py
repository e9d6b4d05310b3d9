"""Callback tests: EarlyStopping halts training; ModelCheckpoint writes files."""
from __future__ import annotations

import os

from deepctr_tpu.models import WDL
from deepctr_tpu.training.callbacks import EarlyStopping, ModelCheckpoint

from tests.utils import SAMPLE_SIZE, get_test_data


def _model_and_data():
    x, y, cols = get_test_data(SAMPLE_SIZE, sparse_feature_num=2,
                               dense_feature_num=1)
    model = WDL(cols, cols, dnn_hidden_units=(4,))
    model.compile("adam", "binary_crossentropy")
    return model, x, y


def test_early_stopping_halts(tmp_path):
    model, x, y = _model_and_data()
    es = EarlyStopping(monitor="loss", patience=0, min_delta=10.0)  # never improves
    hist = model.fit(x, y, batch_size=8, epochs=20, verbose=0, callbacks=[es])
    assert len(hist.history["loss"]) < 20


def test_model_checkpoint_saves(tmp_path):
    model, x, y = _model_and_data()
    path = str(tmp_path / "ckpt_{epoch}.bin")
    model.fit(x, y, batch_size=8, epochs=3, verbose=0,
              callbacks=[ModelCheckpoint(path, monitor="loss")])
    assert os.path.exists(str(tmp_path / "ckpt_3.bin"))


def test_model_summary_counts_params():
    """Keras-surface parity: summary() prints per-param rows and returns
    the total parameter count."""
    import numpy as np

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.models import WDL

    cols = [SparseFeat("c", 50, 4), DenseFeat("d", 1)]
    rng = np.random.RandomState(0)
    x = {"c": rng.randint(0, 50, 16).astype("int32"),
         "d": rng.rand(16, 1).astype("float32")}
    y = rng.randint(0, 2, 16).astype("float32")
    m = WDL(cols, cols, dnn_hidden_units=(4,))
    m.compile("adam", "binary_crossentropy")
    m.fit(x, y, batch_size=16, epochs=1, verbose=0)
    lines = []
    total = m.summary(print_fn=lines.append)
    assert total > 200 and any("Total params" in l for l in lines)
    assert any("emb_c" in l for l in lines)
