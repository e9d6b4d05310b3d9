from deepctr_tpu.models import DCNMix

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


def test_DCNMix():
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=3, dense_feature_num=3
    )
    model = DCNMix(feature_columns, feature_columns, cross_num=1, low_rank=4,
                   num_experts=2, dnn_hidden_units=(8,), dnn_dropout=0.5)
    check_model(model, "DCNMix", x, y)
