import pytest

from deepctr_tpu.models import AFM

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


@pytest.mark.parametrize("use_attention,sparse_feature_num,dense_feature_num",
                         [(True, 3, 0), (False, 2, 0)])
def test_AFM(use_attention, sparse_feature_num, dense_feature_num):
    x, y, feature_columns = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=sparse_feature_num,
        dense_feature_num=dense_feature_num,
    )
    model = AFM(feature_columns, feature_columns, use_attention=use_attention,
                afm_dropout=0.5)
    check_model(model, "AFM", x, y)
