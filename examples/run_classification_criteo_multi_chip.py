"""Criteo classification data-parallel over a TPU mesh.

TPU-native replacement for the reference's multi_gpu_model example
(examples/run_classification_criteo_multi_gpu.py): the batch is sharded over
the 'data' mesh axis and XLA all-reduces the gradients over ICI. On a single
chip this degenerates to the plain path; on CPU set
XLA_FLAGS=--xla_force_host_platform_device_count=8 to exercise 8-way DP.
"""
import jax
import pandas as pd
from sklearn.metrics import log_loss, roc_auc_score
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import LabelEncoder, MinMaxScaler

from deepctr_tpu import DenseFeat, SparseFeat, get_feature_names
from deepctr_tpu.models import DeepFM
from deepctr_tpu.parallel.mesh import make_mesh

from utils import data_path

if __name__ == "__main__":
    data = pd.read_csv(data_path("criteo_sample.txt"))

    sparse_features = ["C" + str(i) for i in range(1, 27)]
    dense_features = ["I" + str(i) for i in range(1, 14)]
    data[sparse_features] = data[sparse_features].fillna("-1")
    data[dense_features] = data[dense_features].fillna(0)
    for feat in sparse_features:
        data[feat] = LabelEncoder().fit_transform(data[feat])
    data[dense_features] = MinMaxScaler().fit_transform(data[dense_features])

    cols = [SparseFeat(f, data[f].max() + 1, 4) for f in sparse_features]
    cols += [DenseFeat(f, 1) for f in dense_features]
    feature_names = get_feature_names(cols)

    train, test = train_test_split(data, test_size=0.2, random_state=2020)
    train_input = {name: train[name].values for name in feature_names}
    test_input = {name: test[name].values for name in feature_names}

    devices = jax.devices()
    mesh = make_mesh((len(devices), 1), ("data", "model"), devices)
    print("mesh:", dict(mesh.shape))

    model = DeepFM(cols, cols, task="binary")
    model.compile("adam", "binary_crossentropy",
                  metrics=["binary_crossentropy"], mesh=mesh)
    model.fit(train_input, train["label"].values, batch_size=256, epochs=10,
              verbose=2, validation_split=0.2)
    pred = model.predict(test_input, batch_size=256)
    print("test LogLoss", round(log_loss(test["label"].values, pred), 4))
    print("test AUC", round(roc_auc_score(test["label"].values, pred), 4))
