"""Build-your-own-model demo (docs/Custom-Models.md): SENetFM — FM over
SENET-reweighted fields + a deep tower, a model the reference zoo does
not ship, assembled from the framework's modular pieces in ~50 lines and
trained on the criteo sample. (Reference capability claim:
docs/source/Features.md:431 "use different modules to build your own
models".)"""
import flax.linen as nn
import pandas as pd
from sklearn.metrics import log_loss, roc_auc_score
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import LabelEncoder, MinMaxScaler

from deepctr_tpu import (SparseFeat, DenseFeat, get_feature_names,
                         load_model, save_model)
from deepctr_tpu.inputs import EmbeddingTables, LinearLogit
from deepctr_tpu.layers.core import DNN, PredictionLayer
from deepctr_tpu.layers.interaction import FM, SENETLayer
from deepctr_tpu.layers.utils import add_func, combined_dnn_input, concat_func
from deepctr_tpu.models._common import (DenseLogit, register,
                                        unified_feature_columns)
from deepctr_tpu.training.model import CTRModel

from utils import data_path


class SENetFMModule(nn.Module):
    feature_columns: tuple
    dnn_hidden_units: tuple = (128, 64)
    reduction_ratio: int = 3
    l2_reg_embedding: float = 1e-5
    task: str = "binary"

    @nn.compact
    def __call__(self, features, training=False):
        tables = EmbeddingTables(self.feature_columns,
                                 self.l2_reg_embedding, name="embeddings")
        sparse_list, dense_list = tables(features)
        linear_logit = LinearLogit(self.feature_columns,
                                   name="linear")(features)
        reweighted = SENETLayer(self.reduction_ratio)(sparse_list, training)
        fm_logit = FM()(concat_func(reweighted, axis=1))
        dnn_out = DNN(tuple(self.dnn_hidden_units),
                      name="dnn")(combined_dnn_input(sparse_list, dense_list),
                                  training=training)
        dnn_logit = DenseLogit(name="dnn_logit")(dnn_out)
        return PredictionLayer(self.task)(
            add_func([linear_logit, fm_logit, dnn_logit]))


@register
def SENetFM(feature_columns, dnn_hidden_units=(128, 64), reduction_ratio=3,
            l2_reg_embedding=1e-5, task="binary", seed=1024):
    module = SENetFMModule(tuple(feature_columns), tuple(dnn_hidden_units),
                           reduction_ratio, l2_reg_embedding, task)
    return CTRModel(module, unified_feature_columns(feature_columns),
                    task=task, seed=seed)


if __name__ == "__main__":
    data = pd.read_csv(data_path("criteo_sample.txt"))
    sparse_features = ["C" + str(i) for i in range(1, 27)]
    dense_features = ["I" + str(i) for i in range(1, 14)]
    data[sparse_features] = data[sparse_features].fillna("-1")
    data[dense_features] = data[dense_features].fillna(0)
    for feat in sparse_features:
        data[feat] = LabelEncoder().fit_transform(data[feat])
    data[dense_features] = MinMaxScaler().fit_transform(data[dense_features])

    cols = [SparseFeat(f, data[f].max() + 1, 4) for f in sparse_features] \
         + [DenseFeat(f, 1) for f in dense_features]

    train, test = train_test_split(data, test_size=0.2, random_state=2020)
    train_input = {n: train[n].values for n in get_feature_names(cols)}
    test_input = {n: test[n].values for n in get_feature_names(cols)}

    model = SENetFM(cols, dnn_hidden_units=(64, 32))
    model.compile("adam", "binary_crossentropy", metrics=["auc"])
    model.fit(train_input, train["label"].values, batch_size=64, epochs=10,
              verbose=2, validation_split=0.1)

    pred = model.predict(test_input, batch_size=64)
    print("test LogLoss", round(log_loss(test["label"].values, pred), 4))
    print("test AUC", round(roc_auc_score(test["label"].values, pred), 4))

    # custom factories round-trip through save/load like zoo models
    save_model(model, "/tmp/senetfm.dctpu")
    reloaded = load_model("/tmp/senetfm.dctpu")
    print("save/load max |diff|:",
          float(abs(reloaded.predict(test_input, batch_size=64) - pred).max()))
