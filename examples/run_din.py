"""DIN on a tiny behavior-sequence fixture
(parity with reference examples/run_din.py)."""
import numpy as np

from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat, get_feature_names
from deepctr_tpu.models import DIN


def get_xy_fd():
    feature_columns = [
        SparseFeat("user", 3, embedding_dim=10),
        SparseFeat("gender", 2, embedding_dim=4),
        SparseFeat("item_id", 3 + 1, embedding_dim=8),
        SparseFeat("cate_id", 2 + 1, embedding_dim=4),
        DenseFeat("pay_score", 1),
    ]
    feature_columns += [
        VarLenSparseFeat(SparseFeat("hist_item_id", vocabulary_size=3 + 1,
                                    embedding_dim=8, embedding_name="item_id"),
                         maxlen=4, length_name="seq_length"),
        VarLenSparseFeat(SparseFeat("hist_cate_id", 2 + 1, embedding_dim=4,
                                    embedding_name="cate_id"),
                         maxlen=4, length_name="seq_length"),
    ]
    # Notice: history behavior sequence feature names must start with "hist_".
    behavior_feature_list = ["item_id", "cate_id"]
    feature_dict = {
        "user": np.array([0, 1, 2]),
        "gender": np.array([0, 1, 0]),
        "item_id": np.array([1, 2, 3]),  # 0 is mask value
        "cate_id": np.array([1, 2, 2]),  # 0 is mask value
        "pay_score": np.array([0.1, 0.2, 0.3]),
        "hist_item_id": np.array([[1, 2, 3, 0], [3, 2, 1, 0], [1, 2, 0, 0]]),
        "hist_cate_id": np.array([[1, 2, 2, 0], [2, 2, 1, 0], [1, 2, 0, 0]]),
        "seq_length": np.array([3, 3, 2]),
    }
    x = {name: feature_dict[name] for name in get_feature_names(feature_columns)}
    y = np.array([1, 0, 1])
    return x, y, feature_columns, behavior_feature_list


if __name__ == "__main__":
    x, y, feature_columns, behavior_feature_list = get_xy_fd()
    model = DIN(feature_columns, behavior_feature_list)
    model.compile("adam", "binary_crossentropy", metrics=["binary_crossentropy"])
    history = model.fit(x, y, verbose=1, epochs=10, validation_split=0.5)
