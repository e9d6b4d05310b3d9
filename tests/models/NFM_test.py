import pytest

from deepctr_tpu.models import NFM

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


@pytest.mark.parametrize("hidden_size,sparse_feature_num", [((8,), 1), ((8, 8), 3)])
def test_NFM(hidden_size, sparse_feature_num):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=sparse_feature_num,
    )
    model = NFM(feature_columns, feature_columns, dnn_hidden_units=hidden_size,
                dnn_dropout=0.5)
    check_model(model, "NFM", x, y)
