import pytest

from deepctr_tpu.models import FNN

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


@pytest.mark.parametrize("sparse_feature_num,dense_feature_num", [(1, 1), (3, 3)])
def test_FNN(sparse_feature_num, dense_feature_num):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=dense_feature_num,
    )
    model = FNN(feature_columns, feature_columns, dnn_hidden_units=(8, 8),
                dnn_dropout=0.5)
    check_model(model, "FNN", x, y)
