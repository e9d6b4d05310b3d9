"""Test utilities: synthetic data generator + end-to-end model checker.

Mirrors the reference harness semantics (tests/utils.py:38-105 get_test_data,
:356-381 check_model): random sparse/dense/varlen features incl. a weighted
sequence, then compile/fit/save/load with prediction-equality assertions.
"""
from __future__ import annotations

import os

import numpy as np

from deepctr_tpu import DEFAULT_GROUP_NAME, DenseFeat, SparseFeat, VarLenSparseFeat
from deepctr_tpu.training.checkpoint import load_model

SAMPLE_SIZE = 8
VOCABULARY_SIZE = 4


def gen_sequence(dim, max_len, sample_size, rng):
    return (
        np.array([rng.randint(0, dim, max_len) for _ in range(sample_size)]),
        rng.randint(1, max_len + 1, sample_size),
    )


def get_test_data(sample_size=1000, embedding_size=4, sparse_feature_num=1,
                  dense_feature_num=1, sequence_feature=None, classification=True,
                  include_length=False, hash_flag=False, prefix="", use_group=False,
                  seed=2018):
    rng = np.random.RandomState(seed)
    if sequence_feature is None:
        sequence_feature = ["sum", "mean", "max", "weight"]
    else:
        sequence_feature = list(sequence_feature)
    feature_columns = []
    model_input = {}

    if "weight" in sequence_feature:
        feature_columns.append(
            VarLenSparseFeat(
                SparseFeat(prefix + "weighted_seq", vocabulary_size=2,
                           embedding_dim=embedding_size),
                maxlen=3, length_name=prefix + "weighted_seq_seq_length",
                weight_name=prefix + "weight",
            )
        )
        s_input, s_len_input = gen_sequence(2, 3, sample_size, rng)
        model_input[prefix + "weighted_seq"] = s_input
        model_input[prefix + "weight"] = rng.randn(sample_size, 3, 1)
        model_input[prefix + "weighted_seq_seq_length"] = s_len_input
        sequence_feature.pop(sequence_feature.index("weight"))

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
    for i, mode in enumerate(sequence_feature):
        dim = rng.randint(1, 10)
        maxlen = rng.randint(1, 10)
        feature_columns.append(
            VarLenSparseFeat(
                SparseFeat(prefix + "sequence_" + mode, vocabulary_size=dim,
                           embedding_dim=embedding_size),
                maxlen=maxlen, combiner=mode,
            )
        )

    for idx, fc in enumerate(feature_columns):
        if isinstance(fc, SparseFeat):
            model_input[fc.name] = rng.randint(0, fc.vocabulary_size, sample_size)
        elif isinstance(fc, DenseFeat):
            model_input[fc.name] = rng.random_sample(sample_size)
        elif fc.name not in model_input:
            s_input, s_len_input = gen_sequence(fc.vocabulary_size, fc.maxlen,
                                                sample_size, rng)
            model_input[fc.name] = s_input
            if include_length:
                feature_columns[idx] = fc._replace(length_name=fc.name + "_seq_length")
                model_input[fc.name + "_seq_length"] = s_len_input

    if classification:
        y = rng.randint(0, 2, sample_size)
    else:
        y = rng.random_sample(sample_size)

    return model_input, y, feature_columns


def check_model(model, model_name, x, y, check_model_io=True):
    """compile -> fit -> save/load weights -> save/load whole model, with
    prediction-equality checks (reference tests/utils.py:356-381)."""
    model.compile("adam", "binary_crossentropy", metrics=["binary_crossentropy"])
    model.fit(x, y, batch_size=100, epochs=1, validation_split=0.5, verbose=0)

    pred_before = model.predict(x, batch_size=100)

    # PID-unique paths: concurrent pytest processes sharing this cwd must
    # not save/remove each other's checkpoint files
    weight_path = "%s_%d_weights.bin" % (model_name, os.getpid())
    model.save_weights(weight_path)
    model.load_weights(weight_path)
    os.remove(weight_path)
    pred_after_w = model.predict(x, batch_size=100)
    np.testing.assert_allclose(pred_before, pred_after_w, rtol=1e-4, atol=1e-5)
    print(model_name + " test save load weight pass!")

    if check_model_io:
        model_path = "%s_%d.dctpu" % (model_name, os.getpid())
        from deepctr_tpu.training.checkpoint import save_model

        save_model(model, model_path)
        model2 = load_model(model_path)
        os.remove(model_path)
        pred_after_m = model2.predict(x, batch_size=100)
        np.testing.assert_allclose(pred_before, pred_after_m, rtol=1e-4, atol=1e-5)
        print(model_name + " test save load model pass!")

    print(model_name + " test pass!")
