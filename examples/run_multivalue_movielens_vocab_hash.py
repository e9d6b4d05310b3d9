"""MovieLens multi-value + vocabulary-file hashing for 'age'
(parity with reference examples/run_multivalue_movielens_vocab_hash.py)."""
import numpy as np
import pandas as pd

from deepctr_tpu import SparseFeat, VarLenSparseFeat, get_feature_names
from deepctr_tpu.models import DeepFM

from utils import data_path, pad_sequences

if __name__ == "__main__":
    data = pd.read_csv(data_path("movielens_sample.txt"))
    sparse_features = ["movie_id", "user_id", "gender", "age", "occupation", "zip"]
    data[sparse_features] = data[sparse_features].astype(str)
    target = ["rating"]

    genres_list = list(map(lambda x: x.split("|"), data["genres"].values))
    max_len = max(map(len, genres_list))
    genres_list = pad_sequences(genres_list, maxlen=max_len, padding="post",
                                value=0, dtype=object).astype(str)

    fixlen_feature_columns = [
        SparseFeat(
            feat, data[feat].nunique() * 5, embedding_dim=4, use_hash=True,
            vocabulary_path=(data_path("movielens_age_vocabulary.csv")
                             if feat == "age" else None),
            dtype="string",
        )
        for feat in sparse_features
    ]
    varlen_feature_columns = [VarLenSparseFeat(
        SparseFeat("genres", vocabulary_size=100, embedding_dim=4, use_hash=True,
                   dtype="string"),
        maxlen=max_len, combiner="mean")]
    linear_feature_columns = fixlen_feature_columns + varlen_feature_columns
    dnn_feature_columns = fixlen_feature_columns + varlen_feature_columns

    model_input = {name: data[name].values for name in sparse_features}
    model_input["genres"] = genres_list

    model = DeepFM(linear_feature_columns, dnn_feature_columns, task="regression")
    model.compile("adam", "mse", metrics=["mse"])
    history = model.fit(model_input, data[target].values, batch_size=256,
                        epochs=10, verbose=2, validation_split=0.2)
