import pytest

from deepctr_tpu.models import ESMM, MMOE, PLE, SharedBottom

from tests.utils_mtl import check_mtl_model, get_mtl_test_data


@pytest.mark.parametrize("task_types", [("binary", "binary"), ("binary", "regression")])
def test_SharedBottom(task_types):
    x, y_list, feature_columns = get_mtl_test_data(
        sparse_feature_num=2, dense_feature_num=2, task_types=task_types
    )
    model = SharedBottom(feature_columns, bottom_dnn_hidden_units=(8,),
                         tower_dnn_hidden_units=(8,), task_types=task_types,
                         task_names=("label1", "label2"))
    check_mtl_model(model, "SharedBottom", x, y_list, task_types)


def test_ESMM():
    task_types = ("binary", "binary")
    x, y_list, feature_columns = get_mtl_test_data(
        sparse_feature_num=2, dense_feature_num=2, task_types=task_types
    )
    model = ESMM(feature_columns, tower_dnn_hidden_units=(8,),
                 task_types=task_types, task_names=("ctr", "ctcvr"))
    check_mtl_model(model, "ESMM", x, y_list, task_types)


def test_ESMM_rejects_regression():
    with pytest.raises(ValueError):
        ESMM([], task_types=("binary", "regression"))


@pytest.mark.parametrize("task_types", [("binary", "binary"), ("binary", "regression")])
def test_MMOE(task_types):
    x, y_list, feature_columns = get_mtl_test_data(
        sparse_feature_num=2, dense_feature_num=2, task_types=task_types
    )
    model = MMOE(feature_columns, num_experts=2, expert_dnn_hidden_units=(8,),
                 tower_dnn_hidden_units=(8,), gate_dnn_hidden_units=(4,),
                 task_types=task_types, task_names=("label1", "label2"))
    check_mtl_model(model, "MMOE", x, y_list, task_types)


@pytest.mark.parametrize("num_levels", [1, 2])
def test_PLE(num_levels):
    task_types = ("binary", "regression")
    x, y_list, feature_columns = get_mtl_test_data(
        sparse_feature_num=2, dense_feature_num=2, task_types=task_types
    )
    model = PLE(feature_columns, shared_expert_num=2, specific_expert_num=1,
                num_levels=num_levels, expert_dnn_hidden_units=(8,),
                tower_dnn_hidden_units=(8,), task_types=task_types,
                task_names=("label1", "label2"))
    check_mtl_model(model, "PLE", x, y_list, task_types)
