"""Criteo classification with on-the-fly (host-side) feature hashing
(parity with reference examples/run_classification_criteo_hash.py)."""
import pandas as pd
from sklearn.metrics import log_loss, roc_auc_score
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import MinMaxScaler

from deepctr_tpu import DenseFeat, SparseFeat, get_feature_names
from deepctr_tpu.models import DeepFM

from utils import data_path

if __name__ == "__main__":
    data = pd.read_csv(data_path("criteo_sample.txt"))

    sparse_features = ["C" + str(i) for i in range(1, 27)]
    dense_features = ["I" + str(i) for i in range(1, 14)]

    data[sparse_features] = data[sparse_features].fillna("-1")
    data[dense_features] = data[dense_features].fillna(0)
    target = ["label"]

    data[dense_features] = MinMaxScaler().fit_transform(data[dense_features])

    fixlen_feature_columns = [
        SparseFeat(feat, vocabulary_size=1000, embedding_dim=4, use_hash=True,
                   dtype="string")
        for feat in sparse_features
    ] + [DenseFeat(feat, 1) for feat in dense_features]

    linear_feature_columns = fixlen_feature_columns
    dnn_feature_columns = fixlen_feature_columns
    feature_names = get_feature_names(linear_feature_columns + dnn_feature_columns)

    train, test = train_test_split(data, test_size=0.2, random_state=2020)
    train_model_input = {name: train[name].values for name in feature_names}
    test_model_input = {name: test[name].values for name in feature_names}

    model = DeepFM(linear_feature_columns, dnn_feature_columns, task="binary")
    model.compile("adam", "binary_crossentropy", metrics=["binary_crossentropy"])

    history = model.fit(train_model_input, train[target].values, batch_size=256,
                        epochs=10, verbose=2, validation_split=0.2)
    pred_ans = model.predict(test_model_input, batch_size=256)
    print("test LogLoss", round(log_loss(test[target].values, pred_ans), 4))
    print("test AUC", round(roc_auc_score(test[target].values, pred_ans), 4))
