import pytest

from deepctr_tpu.models import EDCN

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


@pytest.mark.parametrize("bridge_type,cross_parameterization",
                         [("pointwise_addition", "vector"),
                          ("hadamard_product", "vector"),
                          ("concatenation", "matrix"),
                          ("attention_pooling", "matrix")])
def test_EDCN(bridge_type, cross_parameterization):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=3, dense_feature_num=0,
        sequence_feature=[],
    )
    model = EDCN(feature_columns, feature_columns, cross_num=2,
                 cross_parameterization=cross_parameterization,
                 bridge_type=bridge_type, dnn_dropout=0.5)
    check_model(model, "EDCN", x, y)
