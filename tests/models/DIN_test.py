import numpy as np

from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat, get_feature_names
from deepctr_tpu.models import DIN

from tests.utils import check_model


def get_xy_fd():
    """Mirrors the reference DIN fixture (tests/models/DIN_test.py:10-37)."""
    feature_columns = [
        SparseFeat("user", 3, embedding_dim=10),
        SparseFeat("gender", 2, embedding_dim=4),
        SparseFeat("item_id", 3 + 1, embedding_dim=8),
        SparseFeat("cate_id", 2 + 1, embedding_dim=4),
        DenseFeat("pay_score", 1),
    ]
    feature_columns += [
        VarLenSparseFeat(
            SparseFeat("hist_item_id", vocabulary_size=3 + 1, embedding_dim=8,
                       embedding_name="item_id"),
            maxlen=4, length_name="seq_length",
        ),
        VarLenSparseFeat(
            SparseFeat("hist_cate_id", 2 + 1, embedding_dim=4,
                       embedding_name="cate_id"),
            maxlen=4, length_name="seq_length",
        ),
    ]
    behavior_feature_list = ["item_id", "cate_id"]
    feature_dict = {
        "user": np.array([0, 1, 2]),
        "gender": np.array([0, 1, 0]),
        "item_id": np.array([1, 2, 3]),
        "cate_id": np.array([1, 2, 2]),
        "pay_score": np.array([0.1, 0.2, 0.3]),
        "hist_item_id": np.array([[1, 2, 3, 0], [3, 2, 1, 0], [1, 2, 0, 0]]),
        "hist_cate_id": np.array([[1, 2, 2, 0], [2, 2, 1, 0], [1, 2, 0, 0]]),
        "seq_length": np.array([3, 3, 2]),
    }
    x = {name: feature_dict[name] for name in get_feature_names(feature_columns)}
    y = np.array([1, 0, 1])
    return x, y, feature_columns, behavior_feature_list


def test_DIN():
    x, y, feature_columns, behavior_feature_list = get_xy_fd()
    model = DIN(feature_columns, behavior_feature_list, dnn_hidden_units=[4, 4, 4],
                att_activation="dice", dnn_dropout=0.5)
    check_model(model, "DIN", x, y)


def test_DIN_sigmoid_att():
    x, y, feature_columns, behavior_feature_list = get_xy_fd()
    model = DIN(feature_columns, behavior_feature_list, dnn_hidden_units=[4, 4],
                att_activation="sigmoid", att_weight_normalization=True)
    check_model(model, "DIN_sigmoid", x, y)
