import pytest

from deepctr_tpu.models import DCN

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


@pytest.mark.parametrize(
    "cross_num,hidden_size,sparse_feature_num,cross_parameterization",
    [(0, (8,), 2, "vector"), (1, (), 1, "vector"),
     (1, (8,), 3, "vector"), (1, (8,), 3, "matrix")],
)
def test_DCN(cross_num, hidden_size, sparse_feature_num, cross_parameterization):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=sparse_feature_num,
    )
    model = DCN(feature_columns, feature_columns, cross_num=cross_num,
                cross_parameterization=cross_parameterization,
                dnn_hidden_units=hidden_size, dnn_dropout=0.5)
    check_model(model, "DCN", x, y)
