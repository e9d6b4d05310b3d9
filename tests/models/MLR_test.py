import pytest

from deepctr_tpu.models import MLR

from tests.utils import SAMPLE_SIZE, check_model, get_test_data


@pytest.mark.parametrize("region_sparse,region_dense,base_sparse,base_dense,bias_sparse",
                         [(2, 2, 0, 0, 0), (2, 2, 3, 3, 0), (2, 2, 0, 0, 2)])
def test_MLR(region_sparse, region_dense, base_sparse, base_dense, bias_sparse):
    x, y, region_cols = get_test_data(
        SAMPLE_SIZE, sparse_feature_num=region_sparse, dense_feature_num=region_dense,
        prefix="region_",
    )
    base_cols, bias_cols = [], []
    if base_sparse + base_dense > 0:
        x2, _, base_cols = get_test_data(
            SAMPLE_SIZE, sparse_feature_num=base_sparse, dense_feature_num=base_dense,
            prefix="base_",
        )
        x.update(x2)
    if bias_sparse > 0:
        x3, _, bias_cols = get_test_data(
            SAMPLE_SIZE, sparse_feature_num=bias_sparse, dense_feature_num=0,
            prefix="bias_",
        )
        x.update(x3)
    model = MLR(region_cols, base_cols, bias_feature_columns=bias_cols)
    check_model(model, "MLR", x, y)
