import pytest

from deepctr_tpu.models import DeepFEFM

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


@pytest.mark.parametrize("use_fefm,hidden_size,use_linear,use_fefm_embed_in_dnn",
                         [(True, (8,), True, True), (False, (8,), True, True),
                          (True, (8,), True, False), (True, (), True, True)])
def test_DeepFEFM(use_fefm, hidden_size, use_linear, use_fefm_embed_in_dnn):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=3, dense_feature_num=2
    )
    model = DeepFEFM(feature_columns, feature_columns, use_fefm=use_fefm,
                     dnn_hidden_units=hidden_size, use_linear=use_linear,
                     use_fefm_embed_in_dnn=use_fefm_embed_in_dnn, dnn_dropout=0.5)
    check_model(model, "DeepFEFM", x, y)
