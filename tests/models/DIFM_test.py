from deepctr_tpu.models import DIFM

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


def test_DIFM():
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=3, dense_feature_num=0
    )
    model = DIFM(feature_columns, feature_columns, att_head_num=2,
                 dnn_hidden_units=(8, 8), dnn_dropout=0.5)
    check_model(model, "DIFM", x, y)
