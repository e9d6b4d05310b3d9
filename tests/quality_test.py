"""Quality parity vs self-measured reference goldens (SURVEY §6).

tests/goldens.json was produced by running the reference DeepCTR (TF, via
TF_USE_LEGACY_KERAS=1) on its own criteo sample: each model trained
10 epochs, batch 64, embedding_dim 4, then train-set AUC recorded. Our
models must reach the same memorization quality within tolerance on the
identical setup.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
from sklearn.metrics import roc_auc_score
from sklearn.preprocessing import MinMaxScaler

from deepctr_tpu import DenseFeat, SparseFeat, get_feature_names
from deepctr_tpu import models as zoo

GOLDENS_PATH = os.path.join(os.path.dirname(__file__), "goldens.json")
AUC_TOLERANCE = 0.03

with open(GOLDENS_PATH) as f:
    GOLDENS = json.load(f)


def _criteo():
    data = pd.read_csv("/root/reference/examples/criteo_sample.txt")
    sparse = ["C%d" % i for i in range(1, 27)]
    dense = ["I%d" % i for i in range(1, 14)]
    data[sparse] = data[sparse].fillna("-1")
    data[dense] = data[dense].fillna(0)
    for f in sparse:
        data[f], _ = pd.factorize(data[f])
    data[dense] = MinMaxScaler().fit_transform(data[dense])
    cols = [SparseFeat(f, int(data[f].max() + 1), GOLDENS["embedding_dim"])
            for f in sparse]
    cols += [DenseFeat(f, 1) for f in dense]
    x = {n: data[n].values for n in get_feature_names(cols)}
    return x, data["label"].values, cols


_FACTORIES = {
    "DeepFM": lambda cols: zoo.DeepFM(cols, cols),
    "WDL": lambda cols: zoo.WDL(cols, cols),
    "xDeepFM": lambda cols: zoo.xDeepFM(cols, cols, dnn_hidden_units=(64, 32),
                                        cin_layer_size=(16, 16)),
    "DCN": lambda cols: zoo.DCN(cols, cols, dnn_hidden_units=(64, 32)),
    "AutoInt": lambda cols: zoo.AutoInt(cols, cols, dnn_hidden_units=(64, 32)),
    "FiBiNET": lambda cols: zoo.FiBiNET(cols, cols, dnn_hidden_units=(64, 32)),
    "NFM": lambda cols: zoo.NFM(cols, cols, dnn_hidden_units=(64, 32)),
    "PNN": lambda cols: zoo.PNN(cols, dnn_hidden_units=(64, 32)),
    "DeepFEFM": lambda cols: zoo.DeepFEFM(cols, cols, dnn_hidden_units=(64, 32)),
}


@pytest.mark.parametrize("name", sorted(
    n for n, g in GOLDENS["metrics"].items() if "train_auc" in g
))
def test_auc_parity_with_reference(name):
    golden = GOLDENS["metrics"][name]["train_auc"]
    x, y, cols = _criteo()
    model = _FACTORIES[name](cols)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=GOLDENS["batch_size"], epochs=GOLDENS["epochs"],
              verbose=0)
    p = model.predict(x, batch_size=256)
    auc = roc_auc_score(y, p)
    assert auc >= golden - AUC_TOLERANCE, (
        "%s: our AUC %.4f vs reference golden %.4f" % (name, auc, golden)
    )
