"""Multi-task test utilities (reference tests/utils_mtl.py:13-93)."""
from __future__ import annotations

import os

import numpy as np

from deepctr_tpu import DEFAULT_GROUP_NAME, DenseFeat, SparseFeat
from deepctr_tpu.training.checkpoint import load_model, save_model


def get_mtl_test_data(sample_size=10, embedding_size=4, sparse_feature_num=1,
                      dense_feature_num=1, task_types=("binary", "binary"),
                      hash_flag=False, prefix="", use_group=False, seed=2022):
    rng = np.random.RandomState(seed)
    feature_columns = []
    model_input = {}
    for i in range(sparse_feature_num):
        group_name = str(i % 3) if use_group else DEFAULT_GROUP_NAME
        dim = rng.randint(1, 10)
        feature_columns.append(
            SparseFeat(prefix + "sparse_feature_" + str(i), dim, embedding_size,
                       use_hash=hash_flag, dtype="int32", group_name=group_name)
        )
    for i in range(dense_feature_num):
        def transform_fn(x):
            return (x - 0.0) / 1.0

        feature_columns.append(
            DenseFeat(prefix + "dense_feature_" + str(i), 1, dtype="float32",
                      transform_fn=transform_fn)
        )
    for fc in feature_columns:
        if isinstance(fc, SparseFeat):
            model_input[fc.name] = rng.randint(0, fc.vocabulary_size, sample_size)
        else:
            model_input[fc.name] = rng.random_sample(sample_size)
    y_list = []
    for task in task_types:
        if task == "binary":
            y_list.append(rng.randint(0, 2, sample_size))
        else:
            y_list.append(rng.random_sample(sample_size))
    return model_input, y_list, feature_columns


def check_mtl_model(model, model_name, x, y_list, task_types, check_model_io=True):
    """compile -> fit -> save/load weights -> save/load model (reference
    tests/utils_mtl.py:64-93)."""
    loss_list = [
        "binary_crossentropy" if t == "binary" else "mean_squared_error"
        for t in task_types
    ]
    model.compile("adam", loss=loss_list, metrics=["mae"])
    model.fit(x, y_list, batch_size=100, epochs=1, validation_split=0.5, verbose=0)
    pred_before = model.predict(x, batch_size=100)
    assert pred_before.shape[1] == len(task_types)

    weight_path = model_name + "_weights.bin"
    model.save_weights(weight_path)
    model.load_weights(weight_path)
    os.remove(weight_path)
    np.testing.assert_allclose(pred_before, model.predict(x, batch_size=100),
                               rtol=1e-4, atol=1e-5)
    print(model_name + " test save load weight pass!")

    if check_model_io:
        model_path = model_name + ".dctpu"
        save_model(model, model_path)
        model2 = load_model(model_path)
        os.remove(model_path)
        np.testing.assert_allclose(pred_before, model2.predict(x, batch_size=100),
                                   rtol=1e-4, atol=1e-5)
        print(model_name + " test save load model pass!")
    print(model_name + " test pass!")
