"""Generate criteo-sample TFRecord files (reference examples/gen_tfrecords.py
parity, without TensorFlow): label-encoded sparse C1..C26 as int64 features,
min-max-scaled dense I1..I13 + label as float features."""
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from deepctr_tpu.estimator.tfrecord import write_tfrecord_examples  # noqa: E402

DATA = os.environ.get("CRITEO_SAMPLE",
                      "/root/reference/examples/criteo_sample.txt")

if __name__ == "__main__":
    data = pd.read_csv(DATA)
    sparse_features = ["C" + str(i) for i in range(1, 27)]
    dense_features = ["I" + str(i) for i in range(1, 14)]
    data[sparse_features] = data[sparse_features].fillna("-1")
    data[dense_features] = data[dense_features].fillna(0)
    for feat in sparse_features:
        data[feat] = pd.factorize(data[feat])[0]
    mins = data[dense_features].min()
    data[dense_features] = (data[dense_features] - mins) / (
        data[dense_features].max() - mins + 1e-8)

    split = int(len(data) * 0.8)
    for name, df in (("tr", data.iloc[:split]), ("te", data.iloc[split:])):
        path = "./criteo_sample.%s.tfrecords" % name
        n = write_tfrecord_examples(
            path,
            ({**{f: int(row[f]) for f in sparse_features},
              **{f: float(row[f]) for f in dense_features},
              "label": float(row["label"])}
             for _, row in df.iterrows()),
        )
        print("wrote %d records -> %s" % (n, path))
