import numpy as np
import pytest

from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat, get_feature_names
from deepctr_tpu.models import DIEN

from tests.utils import check_model


def get_xy_fd(use_neg=False):
    """Mirrors the reference DIEN fixture (tests/models/DIEN_test.py:11-53)."""
    feature_columns = [
        SparseFeat("user", 3),
        SparseFeat("gender", 2),
        SparseFeat("item", 3 + 1, embedding_dim=8),
        SparseFeat("item_gender", 2 + 1, embedding_dim=4),
        DenseFeat("score", 1),
    ]
    feature_columns += [
        VarLenSparseFeat(
            SparseFeat("hist_item", vocabulary_size=3 + 1, embedding_dim=8,
                       embedding_name="item"),
            maxlen=4, length_name="seq_length",
        ),
        VarLenSparseFeat(
            SparseFeat("hist_item_gender", 2 + 1, embedding_dim=4,
                       embedding_name="item_gender"),
            maxlen=4, length_name="seq_length",
        ),
    ]
    behavior_feature_list = ["item", "item_gender"]
    feature_dict = {
        "user": np.array([0, 1, 2]),
        "gender": np.array([0, 1, 0]),
        "item": np.array([1, 2, 3]),
        "item_gender": np.array([1, 2, 1]),
        "score": np.array([0.1, 0.2, 0.3]),
        "hist_item": np.array([[1, 2, 3, 0], [1, 2, 3, 0], [1, 2, 0, 0]]),
        "hist_item_gender": np.array([[1, 1, 2, 0], [2, 1, 1, 0], [2, 1, 0, 0]]),
        "seq_length": np.array([3, 3, 2]),
    }
    if use_neg:
        feature_dict["neg_hist_item"] = np.array(
            [[1, 2, 3, 0], [1, 2, 3, 0], [1, 2, 0, 0]])
        feature_dict["neg_hist_item_gender"] = np.array(
            [[1, 1, 2, 0], [2, 1, 1, 0], [2, 1, 0, 0]])
        feature_columns += [
            VarLenSparseFeat(
                SparseFeat("neg_hist_item", vocabulary_size=3 + 1, embedding_dim=8,
                           embedding_name="item"),
                maxlen=4, length_name="seq_length",
            ),
            VarLenSparseFeat(
                SparseFeat("neg_hist_item_gender", 2 + 1, embedding_dim=4,
                           embedding_name="item_gender"),
                maxlen=4, length_name="seq_length",
            ),
        ]
    x = {name: feature_dict[name] for name in get_feature_names(feature_columns)}
    y = np.array([1, 0, 1])
    return x, y, feature_columns, behavior_feature_list


@pytest.mark.parametrize("gru_type", ["GRU", "AIGRU", "AGRU", "AUGRU"])
def test_DIEN(gru_type):
    x, y, feature_columns, behavior_feature_list = get_xy_fd()
    model = DIEN(feature_columns, behavior_feature_list,
                 dnn_hidden_units=[4, 4, 4], dnn_dropout=0.5, gru_type=gru_type)
    check_model(model, "DIEN_" + gru_type, x, y)


def test_DIEN_neg():
    x, y, feature_columns, behavior_feature_list = get_xy_fd(use_neg=True)
    model = DIEN(feature_columns, behavior_feature_list, dnn_hidden_units=[4, 4, 4],
                 dnn_dropout=0.5, gru_type="AUGRU", use_negsampling=True)
    check_model(model, "DIEN_neg", x, y)
