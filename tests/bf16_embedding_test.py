"""bf16 embedding-table storage tests."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deepctr_tpu.models import DeepFM
from deepctr_tpu.training.optimizers import embedding_split_optimizer

from tests.utils import SAMPLE_SIZE, get_test_data


def test_bf16_tables_cast_and_train():
    x, y, cols = get_test_data(SAMPLE_SIZE, sparse_feature_num=3,
                               dense_feature_num=1)
    model = DeepFM(cols, cols, dnn_hidden_units=(4,))
    model.compile(embedding_split_optimizer(), "binary_crossentropy",
                  embedding_dtype="bfloat16")
    hist = model.fit(x, y, batch_size=8, epochs=5, verbose=0)
    # every emb_* param is stored bf16; everything else stays f32
    flat = jax.tree_util.tree_flatten_with_path(model.state.params)[0]
    n_bf16 = 0
    for path, leaf in flat:
        is_table = any(str(getattr(k, "key", k)).startswith("emb_") for k in path)
        if is_table:
            assert leaf.dtype == jnp.bfloat16, path
            n_bf16 += 1
        else:
            assert leaf.dtype == jnp.float32, path
    assert n_bf16 > 0
    assert np.isfinite(hist.history["loss"][-1])
    assert hist.history["loss"][-1] < hist.history["loss"][0]
    preds = model.predict(x, batch_size=8)
    assert preds.dtype == np.float32 and np.all(np.isfinite(preds))


def test_bf16_quality_close_to_f32():
    x, y, cols = get_test_data(200, sparse_feature_num=4, dense_feature_num=2,
                               seed=7)
    losses = {}
    for dtype in [None, "bfloat16"]:
        model = DeepFM(cols, cols, dnn_hidden_units=(8,))
        model.compile(embedding_split_optimizer(), "binary_crossentropy",
                      embedding_dtype=dtype)
        hist = model.fit(x, y, batch_size=64, epochs=15, verbose=0)
        losses[dtype] = hist.history["loss"][-1]
    assert abs(losses[None] - losses["bfloat16"]) < 0.08, losses
