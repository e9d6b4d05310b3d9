"""Estimator API + TFRecord input_fn on criteo sample
(parity with reference examples/run_estimator_tfrecord_classification.py).
The TFRecord/Example decoding is the framework's pure-Python reader —
no TensorFlow required."""
from deepctr_tpu import DenseFeat, SparseFeat
from deepctr_tpu.estimator import (
    DeepFMEstimator,
    FixedLenFeature,
    input_fn_tfrecord,
)

from utils import data_path

if __name__ == "__main__":
    sparse_features = ["C" + str(i) for i in range(1, 27)]
    dense_features = ["I" + str(i) for i in range(1, 14)]

    dnn_feature_columns = [SparseFeat(f, 1000, 4) for f in sparse_features]
    dnn_feature_columns += [DenseFeat(f, 1) for f in dense_features]
    linear_feature_columns = dnn_feature_columns

    feature_description = {k: FixedLenFeature((1,), "int64") for k in sparse_features}
    feature_description.update(
        {k: FixedLenFeature((1,), "float32") for k in dense_features})
    feature_description["label"] = FixedLenFeature((1,), "float32")

    train_model_input = input_fn_tfrecord(
        data_path("criteo_sample.tr.tfrecords"), feature_description, "label",
        batch_size=256, num_epochs=1, shuffle_factor=10)
    test_model_input = input_fn_tfrecord(
        data_path("criteo_sample.te.tfrecords"), feature_description, "label",
        batch_size=2 ** 14, num_epochs=1, shuffle_factor=0)

    model = DeepFMEstimator(linear_feature_columns, dnn_feature_columns,
                            task="binary")
    model.train(train_model_input)
    eval_result = model.evaluate(test_model_input)
    print(eval_result)
