"""Estimator API + pandas input_fn on criteo sample
(parity with reference examples/run_estimator_pandas_classification.py).

Columns are built in the reference script's own tf.feature_column style
via the migration shim (deepctr_tpu.feature_column) — framework
SparseFeat/DenseFeat specs work identically (see other examples)."""
import pandas as pd
from sklearn.metrics import log_loss, roc_auc_score
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import LabelEncoder, MinMaxScaler

from deepctr_tpu import feature_column as fc
from deepctr_tpu.estimator import DeepFMEstimator, input_fn_pandas

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

    dnn_feature_columns = []
    linear_feature_columns = []
    for feat in sparse_features:
        ident = fc.categorical_column_with_identity(feat, data[feat].max() + 1)
        dnn_feature_columns.append(fc.embedding_column(ident, 4))
        linear_feature_columns.append(ident)
    for feat in dense_features:
        dnn_feature_columns.append(fc.numeric_column(feat))
        linear_feature_columns.append(fc.numeric_column(feat))

    train, test = train_test_split(data, test_size=0.2, random_state=2021)
    feature_names = sparse_features + dense_features

    train_input = input_fn_pandas(train, feature_names, "label", shuffle=True)
    test_input = input_fn_pandas(test, feature_names, None, shuffle=False)

    model = DeepFMEstimator(linear_feature_columns, dnn_feature_columns,
                            task="binary")
    model.train(train_input)
    pred_ans_iter = model.predict(test_input)
    pred_ans = list(map(lambda x: x["pred"], pred_ans_iter))

    print("test LogLoss", round(log_loss(test["label"].values, pred_ans), 4))
    print("test AUC", round(roc_auc_score(test["label"].values, pred_ans), 4))
