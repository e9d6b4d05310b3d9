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
