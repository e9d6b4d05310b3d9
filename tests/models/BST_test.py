from deepctr_tpu.models import BST

from tests.utils import check_model
from tests.models.DIN_test import get_xy_fd


def test_BST():
    x, y, feature_columns, behavior_feature_list = get_xy_fd()
    model = BST(dnn_feature_columns=feature_columns,
                history_feature_list=behavior_feature_list, att_head_num=4)
    check_model(model, "BST", x, y)
