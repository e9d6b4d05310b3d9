from deepctr_tpu.models import ONN

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


def test_ONN():
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=2, dense_feature_num=2,
        sequence_feature=["sum", "mean", "max"],
    )
    model = ONN(feature_columns, feature_columns, dnn_hidden_units=(8, 8),
                dnn_dropout=0.5)
    check_model(model, "ONN", x, y)
