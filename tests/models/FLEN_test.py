from deepctr_tpu.models import FLEN

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


def test_FLEN():
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=6, dense_feature_num=6, use_group=True
    )
    model = FLEN(feature_columns, feature_columns, dnn_hidden_units=(3,),
                 dnn_dropout=0.5)
    check_model(model, "FLEN", x, y)
