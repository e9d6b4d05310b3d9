"""Regenerate the 20-model criteo goldens as mean-of->=5-seed runs with
variance-derived tolerances (SURVEY §7 / VERDICT r2 Weak #4: the battery
was single-golden with a flat 0.03 tolerance).

Runs the REFERENCE DeepCTR (TF) on its criteo sample with exactly the
model configs of tests/quality_test.py::_FACTORIES. Prints the JSON for
tests/goldens.json 'metrics'. Run:

  TF_USE_LEGACY_KERAS=1 TF_CPP_MIN_LOG_LEVEL=3 \
  PYTHONPATH=/root/reference python tools/gen_criteo_goldens_ref.py
"""
import json
import sys

import numpy as np
import pandas as pd
from sklearn.metrics import roc_auc_score
from sklearn.preprocessing import MinMaxScaler

SEEDS = [1024, 7, 2020, 42, 123]
EPOCHS = 10
BATCH = 64
EDIM = 4


def criteo():
    from deepctr.feature_column import DenseFeat, SparseFeat

    data = pd.read_csv("/root/reference/examples/criteo_sample.txt")
    sparse = ["C%d" % i for i in range(1, 27)]
    dense = ["I%d" % i for i in range(1, 14)]
    data[sparse] = data[sparse].fillna("-1")
    data[dense] = data[dense].fillna(0)
    for f in sparse:
        data[f], _ = pd.factorize(data[f])
    data[dense] = MinMaxScaler().fit_transform(data[dense])
    cols = [SparseFeat(f, int(data[f].max() + 1), EDIM) for f in sparse]
    cols8 = cols[:8]
    cols = cols + [DenseFeat(f, 1) for f in dense]
    return data, cols, cols8


def factories():
    from deepctr import models as zoo

    return {
        "DeepFM": lambda c, c8, s: (zoo.DeepFM(c, c, seed=s), c),
        "WDL": lambda c, c8, s: (zoo.WDL(c, c, seed=s), c),
        "xDeepFM": lambda c, c8, s: (zoo.xDeepFM(
            c, c, dnn_hidden_units=(64, 32), cin_layer_size=(16, 16),
            seed=s), c),
        "DCN": lambda c, c8, s: (zoo.DCN(c, c, dnn_hidden_units=(64, 32),
                                         seed=s), c),
        "AutoInt": lambda c, c8, s: (zoo.AutoInt(
            c, c, dnn_hidden_units=(64, 32), seed=s), c),
        "FiBiNET": lambda c, c8, s: (zoo.FiBiNET(
            c, c, dnn_hidden_units=(64, 32), seed=s), c),
        "NFM": lambda c, c8, s: (zoo.NFM(c, c, dnn_hidden_units=(64, 32),
                                         seed=s), c),
        "PNN": lambda c, c8, s: (zoo.PNN(c, dnn_hidden_units=(64, 32),
                                         seed=s), c),
        "DeepFEFM": lambda c, c8, s: (zoo.DeepFEFM(
            c, c, dnn_hidden_units=(64, 32), seed=s), c),
        "AFM": lambda c, c8, s: (zoo.AFM(c8, c8, seed=s), c8),
        "FNN": lambda c, c8, s: (zoo.FNN(c, c, dnn_hidden_units=(64, 32),
                                         seed=s), c),
        "CCPM": lambda c, c8, s: (zoo.CCPM(
            c8, c8, conv_kernel_width=(3, 2), conv_filters=(4, 4),
            dnn_hidden_units=(32,), seed=s), c8),
        "FGCNN": lambda c, c8, s: (zoo.FGCNN(
            c8, c8, conv_kernel_width=(3, 3), conv_filters=(4, 4),
            new_maps=(2, 2), pooling_width=(2, 2), dnn_hidden_units=(32,),
            seed=s), c8),
        "IFM": lambda c, c8, s: (zoo.IFM(c8, c8, dnn_hidden_units=(32, 16),
                                         seed=s), c8),
        "DIFM": lambda c, c8, s: (zoo.DIFM(
            c8, c8, att_head_num=2, dnn_hidden_units=(32, 16), seed=s), c8),
        "FwFM": lambda c, c8, s: (zoo.FwFM(c, c, dnn_hidden_units=(64, 32),
                                           seed=s), c),
        "EDCN": lambda c, c8, s: (zoo.EDCN(c8, c8, seed=s), c8),
        "DCNMix": lambda c, c8, s: (zoo.DCNMix(
            c, c, dnn_hidden_units=(64, 32), low_rank=8, num_experts=2,
            seed=s), c),
        "ONN": lambda c, c8, s: (zoo.ONN(c8, c8, dnn_hidden_units=(32,),
                                         seed=s), c8),
        "MLR": lambda c, c8, s: (zoo.MLR(c, seed=s), c),
    }


def main():
    import tensorflow as tf
    from deepctr.feature_column import get_feature_names

    data, cols, cols8 = criteo()
    y = data["label"].values
    out = {}
    for name, make in factories().items():
        aucs = []
        try:
            for seed in SEEDS:
                tf.keras.backend.clear_session()
                tf.keras.utils.set_random_seed(seed)
                model, used = make(cols, cols8, seed)
                x = {n: data[n].values
                     for n in get_feature_names(used)}
                model.compile("adam", "binary_crossentropy")
                model.fit(x, y, batch_size=BATCH, epochs=EPOCHS, verbose=0)
                aucs.append(float(roc_auc_score(
                    y, model.predict(x, batch_size=256))))
            arr = np.asarray(aucs)
            out[name] = {
                "seeds": SEEDS,
                "seed_runs": [round(v, 4) for v in aucs],
                "train_auc": round(float(arr.mean()), 4),
                "tolerance": round(float(max(3 * arr.std(), 0.02)), 4),
            }
        except Exception as e:
            out[name] = {"error": "%s: %s" % (type(e).__name__,
                                              str(e)[:300])}
        print("done:", name, out[name].get("train_auc",
                                           out[name].get("error")),
              file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
