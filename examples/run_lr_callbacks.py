"""Learning-rate schedules + training callbacks on the criteo sample.

Reference users drive these via tf.keras.callbacks (reference
docs/source/FAQ.md:26-37); here the same classes come from
``deepctr_tpu.callbacks``. LR mutation is retrace-free: the rate scale is
a traced scalar inside the optimizer state (optimizers.MutableLR), so a
per-epoch schedule never recompiles the train step — on a remote TPU a
recompile costs seconds-to-minutes, so this matters.
"""
import pandas as pd
from sklearn.preprocessing import LabelEncoder, MinMaxScaler

from deepctr_tpu import DenseFeat, SparseFeat, get_feature_names
from deepctr_tpu.callbacks import (CSVLogger, LearningRateScheduler,
                                   ReduceLROnPlateau)
from deepctr_tpu.models import DeepFM

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

    cols = [SparseFeat(f, data[f].max() + 1, embedding_dim=4)
            for f in sparse_features] + [DenseFeat(f, 1)
                                         for f in dense_features]
    x = {n: data[n].values for n in get_feature_names(cols)}
    y = data["label"].values

    model = DeepFM(cols, cols, task="binary")
    model.compile("adam", "binary_crossentropy")

    callbacks = [
        # halve the LR every 3 epochs (schedule may take (epoch) or
        # (epoch, current_lr))
        LearningRateScheduler(lambda epoch: 0.001 * (0.5 ** (epoch // 3)),
                              verbose=1),
        # and back off on plateaus (multiplicative, composes with above)
        ReduceLROnPlateau(monitor="val_loss", factor=0.5, patience=2,
                          min_lr=1e-5, verbose=1),
        CSVLogger("training_log.csv"),
    ]
    hist = model.fit(x, y, batch_size=64, epochs=8, verbose=1,
                     validation_split=0.2, callbacks=callbacks)
    print("per-epoch lr:", [round(v, 6) for v in hist.history["lr"]])
    print("final model.learning_rate =", model.learning_rate)
    import csv, os
    with open("training_log.csv") as f:
        n_rows = sum(1 for _ in csv.reader(f)) - 1
    print("training_log.csv: %d epoch rows" % n_rows)
    os.remove("training_log.csv")  # keep the examples dir clean
