from deepctr_tpu.models import IFM

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


def test_IFM():
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=3, dense_feature_num=0
    )
    model = IFM(feature_columns, feature_columns, dnn_hidden_units=(8, 8),
                dnn_dropout=0.5)
    check_model(model, "IFM", x, y)
