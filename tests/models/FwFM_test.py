from deepctr_tpu.models import FwFM

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


def test_FwFM():
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=3, dense_feature_num=2
    )
    model = FwFM(feature_columns, feature_columns, dnn_hidden_units=(8,),
                 dnn_dropout=0.5)
    check_model(model, "FwFM", x, y)
