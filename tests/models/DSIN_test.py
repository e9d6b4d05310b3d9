import numpy as np
import pytest

from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat, get_feature_names
from deepctr_tpu.models import DSIN

from tests.utils import check_model


def get_xy_fd():
    """Mirrors the reference DSIN fixture (tests/models/DSIN_test.py:9-50)."""
    feature_columns = [
        SparseFeat("user", 3),
        SparseFeat("gender", 2),
        SparseFeat("item", 3 + 1),
        SparseFeat("item_gender", 2 + 1),
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


@pytest.mark.parametrize("bias_encoding", [True, False])
def test_DSIN(bias_encoding):
    x, y, feature_columns, behavior_feature_list = get_xy_fd()
    model = DSIN(feature_columns, behavior_feature_list, sess_max_count=2,
                 bias_encoding=bias_encoding, dnn_hidden_units=[4, 4],
                 dnn_dropout=0.5)
    check_model(model, "DSIN", x, y)
