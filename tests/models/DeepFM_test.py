import pytest

from deepctr_tpu.models import DeepFM

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


@pytest.mark.parametrize(
    "use_fm,hidden_size,sparse_feature_num,dense_feature_num",
    [(True, (2,), 1, 1), (False, (2,), 1, 1), (True, (2, 2), 2, 2)],
)
def test_DeepFM(use_fm, hidden_size, sparse_feature_num, dense_feature_num):
    model_name = "DeepFM"
    sample_size = SAMPLE_SIZE
    x, y, feature_columns = get_test_data(
        sample_size, sparse_feature_num=sparse_feature_num,
        dense_feature_num=dense_feature_num,
    )
    fm_group = ("default_group",) if use_fm else ()
    model = DeepFM(feature_columns, feature_columns, fm_group=fm_group,
                   dnn_hidden_units=hidden_size, dnn_dropout=0.5)
    check_model(model, model_name, x, y)


def test_DeepFM_use_group():
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=4, dense_feature_num=2, use_group=True
    )
    model = DeepFM(feature_columns, feature_columns,
                   fm_group=("default_group", "0", "1"),
                   dnn_hidden_units=(2,), dnn_dropout=0.5)
    check_model(model, "DeepFM_group", x, y)
