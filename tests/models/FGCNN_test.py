from deepctr_tpu.models import FGCNN

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


def test_FGCNN():
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, embedding_size=8, sparse_feature_num=6, dense_feature_num=2,
        sequence_feature=["sum", "mean", "max"],
    )
    model = FGCNN(feature_columns, feature_columns, conv_kernel_width=(3, 2),
                  conv_filters=(4, 6), new_maps=(2, 2), pooling_width=(2, 2),
                  dnn_hidden_units=(8,), dnn_dropout=0.5)
    check_model(model, "FGCNN", x, y)
