"""MovieLens with a multi-valued 'genres' sequence feature
(parity with reference examples/run_multivalue_movielens.py)."""
import numpy as np
import pandas as pd
from sklearn.preprocessing import LabelEncoder

from deepctr_tpu import SparseFeat, VarLenSparseFeat, get_feature_names
from deepctr_tpu.models import DeepFM

from utils import data_path, pad_sequences

key2index = {}


def split(x):
    key_ans = x.split("|")
    for key in key_ans:
        if key not in key2index:
            # value 0 is reserved for padding
            key2index[key] = len(key2index) + 1
    return list(map(lambda k: key2index[k], key_ans))


if __name__ == "__main__":
    data = pd.read_csv(data_path("movielens_sample.txt"))
    sparse_features = ["movie_id", "user_id", "gender", "age", "occupation", "zip"]
    target = ["rating"]

    for feat in sparse_features:
        data[feat] = LabelEncoder().fit_transform(data[feat])

    genres_list = list(map(split, data["genres"].values))
    genres_length = np.array(list(map(len, genres_list)))
    max_len = max(genres_length)
    genres_list = pad_sequences(genres_list, maxlen=max_len, padding="post")

    fixlen_feature_columns = [
        SparseFeat(feat, data[feat].max() + 1, embedding_dim=4)
        for feat in sparse_features
    ]
    use_weighted_sequence = False
    if use_weighted_sequence:
        varlen_feature_columns = [VarLenSparseFeat(
            SparseFeat("genres", vocabulary_size=len(key2index) + 1, embedding_dim=4),
            maxlen=max_len, combiner="mean", weight_name="genres_weight")]
    else:
        varlen_feature_columns = [VarLenSparseFeat(
            SparseFeat("genres", vocabulary_size=len(key2index) + 1, embedding_dim=4),
            maxlen=max_len, combiner="mean", weight_name=None)]

    linear_feature_columns = fixlen_feature_columns + varlen_feature_columns
    dnn_feature_columns = fixlen_feature_columns + varlen_feature_columns
    feature_names = get_feature_names(linear_feature_columns + dnn_feature_columns)

    model_input = {name: data[name].values for name in sparse_features}
    model_input["genres"] = genres_list
    model_input["genres_weight"] = np.random.randn(data.shape[0], max_len, 1)

    model = DeepFM(linear_feature_columns, dnn_feature_columns, task="regression")
    model.compile("adam", "mse", metrics=["mse"])
    history = model.fit(model_input, data[target].values, batch_size=256,
                        epochs=10, verbose=2, validation_split=0.2)
