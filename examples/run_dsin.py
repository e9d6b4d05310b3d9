"""DSIN on a tiny session fixture (parity with reference examples/run_dsin.py)."""
import numpy as np

from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat, get_feature_names
from deepctr_tpu.models import DSIN


def get_xy_fd(hash_flag=False):
    feature_columns = [
        SparseFeat("user", 3, embedding_dim=10, use_hash=hash_flag),
        SparseFeat("gender", 2, embedding_dim=4, use_hash=hash_flag),
        SparseFeat("item", 3 + 1, embedding_dim=4, use_hash=hash_flag),
        SparseFeat("item_gender", 2 + 1, embedding_dim=4, use_hash=hash_flag),
        DenseFeat("score", 1),
    ]
    feature_columns += [
        VarLenSparseFeat(SparseFeat("sess_0_item", 3 + 1, embedding_dim=4,
                                    embedding_name="item"), maxlen=4),
        VarLenSparseFeat(SparseFeat("sess_0_item_gender", 2 + 1, embedding_dim=4,
                                    embedding_name="item_gender"), maxlen=4),
        VarLenSparseFeat(SparseFeat("sess_1_item", 3 + 1, embedding_dim=4,
                                    embedding_name="item"), maxlen=4),
        VarLenSparseFeat(SparseFeat("sess_1_item_gender", 2 + 1, embedding_dim=4,
                                    embedding_name="item_gender"), maxlen=4),
    ]
    behavior_feature_list = ["item", "item_gender"]
    feature_dict = {
        "user": np.array([0, 1, 2]),
        "gender": np.array([0, 1, 0]),
        "item": np.array([1, 2, 3]),
        "item_gender": np.array([1, 2, 1]),
        "score": np.array([0.1, 0.2, 0.3]),
        "sess_0_item": np.array([[1, 2, 3, 0], [1, 2, 3, 0], [0, 0, 0, 0]]),
        "sess_0_item_gender": np.array([[1, 1, 2, 0], [2, 1, 1, 0], [0, 0, 0, 0]]),
        "sess_1_item": np.array([[1, 2, 3, 0], [0, 0, 0, 0], [0, 0, 0, 0]]),
        "sess_1_item_gender": np.array([[1, 1, 2, 0], [0, 0, 0, 0], [0, 0, 0, 0]]),
    }
    x = {name: feature_dict[name] for name in get_feature_names(feature_columns)}
    x["sess_length"] = np.array([2, 1, 0])
    y = np.array([1, 0, 1])
    return x, y, feature_columns, behavior_feature_list


if __name__ == "__main__":
    x, y, feature_columns, behavior_feature_list = get_xy_fd(True)
    model = DSIN(feature_columns, behavior_feature_list, sess_max_count=2,
                 dnn_hidden_units=[4, 4, 4])
    model.compile("adam", "binary_crossentropy", metrics=["binary_crossentropy"])
    history = model.fit(x, y, verbose=1, epochs=10, validation_split=0.5)
