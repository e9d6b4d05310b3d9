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


class TestStochasticRounding:
    def test_sr_is_unbiased_where_truncation_is_not(self):
        import jax
        from deepctr_tpu.training.sparse_embedding import stochastic_round_bf16

        # value 1/4 of the way between two bf16 grid points: bf16 has an
        # 7-bit mantissa, so around 1.0 the grid step is 2**-7
        lo, hi = 1.0, 1.0 + 2.0 ** -7
        x = jnp.full((20000,), lo + 0.25 * (hi - lo), jnp.float32)
        r = stochastic_round_bf16(x, jax.random.PRNGKey(0)).astype(jnp.float32)
        # only the two neighbors appear
        assert set(np.unique(np.asarray(r))) <= {float(lo), float(hi)}
        # mean within 2% of the true value; plain truncation would sit at lo
        mean = float(r.mean())
        want = float(x[0])
        assert abs(mean - want) < 0.02 * (float(hi) - float(lo)) + 1e-9
        trunc = float(x.astype(jnp.bfloat16).astype(jnp.float32)[0])
        assert abs(trunc - want) > abs(mean - want)

    def test_bf16_sr_training_tracks_f32(self):
        from deepctr_tpu.models import DeepFM
        from tests.utils import SAMPLE_SIZE, get_test_data

        x, y, cols = get_test_data(64, sparse_feature_num=3,
                                   dense_feature_num=1, seed=2018)

        def run(**kw):
            m = DeepFM(cols, cols, dnn_hidden_units=(4,), seed=1024)
            m.compile("adam", "binary_crossentropy",
                      sparse_embedding_updates=True, **kw)
            return m.fit(x, y, batch_size=16, epochs=3, shuffle=False,
                         verbose=0).history["loss"]

        f32 = run()
        sr = run(embedding_dtype="bfloat16", bf16_stochastic_rounding=True)
        np.testing.assert_allclose(sr, f32, rtol=0.05)

    def test_flag_validation(self):
        import pytest
        from deepctr_tpu.models import DeepFM
        from tests.utils import get_test_data

        x, y, cols = get_test_data(8, sparse_feature_num=2,
                                   dense_feature_num=1, seed=2018)
        m = DeepFM(cols, cols, dnn_hidden_units=(4,))
        with pytest.raises(ValueError, match="bfloat16"):
            m.compile("adam", bf16_stochastic_rounding=True,
                      sparse_embedding_updates=True)
        with pytest.raises(ValueError, match="sparse_embedding_updates"):
            m.compile("adam", bf16_stochastic_rounding=True,
                      embedding_dtype="bfloat16")
