"""Model-tier STREAMING training from .tfrecords: CTRModel.fit(input_fn).

The constant-memory TFRecord pipeline (mmap + native C++ Example parse +
shuffle pool + prefetch thread, deepctr_tpu/estimator/streaming.py) feeds
``CTRModel.fit`` directly — no in-RAM dataset. This is the large-scale
shape of the reference's estimator input_fns
(reference deepctr/estimator/inputs.py:22-52) on the Keras-fit tier.
"""
import numpy as np

from deepctr_tpu import DenseFeat, SparseFeat
from deepctr_tpu.estimator.inputs import FixedLenFeature, input_fn_tfrecord
from deepctr_tpu.models import DeepFM

from utils import data_path

if __name__ == "__main__":
    sparse_features = ["C" + str(i) for i in range(1, 27)]
    dense_features = ["I" + str(i) for i in range(1, 14)]
    VOCAB = 1000

    desc = {f: FixedLenFeature((1,), "float32", 0.0) for f in dense_features}
    desc.update({f: FixedLenFeature((1,), "int64", 0)
                 for f in sparse_features})
    desc["label"] = FixedLenFeature((1,), "float32")

    train_path = data_path("criteo_sample.tr.tfrecords")
    test_path = data_path("criteo_sample.te.tfrecords")

    def hashed(fn):
        # sample tfrecords carry raw encoded ids; fold into the vocab
        def gen():
            for x, y in fn():
                for f in sparse_features:
                    x[f] = np.asarray(x[f]) % VOCAB
                yield x, y
        return gen

    train_fn = hashed(input_fn_tfrecord(
        train_path, desc, label="label", batch_size=64, num_epochs=None,
        shuffle_factor=10))
    test_fn = hashed(input_fn_tfrecord(
        test_path, desc, label="label", batch_size=64, num_epochs=1))

    cols = ([SparseFeat(f, VOCAB, 4) for f in sparse_features] +
            [DenseFeat(f, 1) for f in dense_features])

    model = DeepFM(cols, cols, task="binary")
    model.compile("adam", "binary_crossentropy", metrics=["auc", "logloss"])
    # repeating stream + steps_per_epoch + steps_per_execution, the
    # recommended large-scale configuration
    model.fit(train_fn, epochs=3, steps_per_epoch=3, steps_per_execution=3,
              verbose=1)
    logs = model.evaluate(test_fn)
    print("test", " - ".join("%s: %.4f" % kv for kv in logs.items()))
