"""Optimizer tests: FTRL, rowwise adagrad, embedding-split, dual-group."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepctr_tpu.training.optimizers import (
    dual_group_optimizer,
    embedding_split_optimizer,
    ftrl,
    resolve_optimizer,
    rowwise_adagrad,
)


def test_rowwise_adagrad_state_is_one_scalar_per_row():
    params = {"emb_table": jnp.ones((100, 16)), "bias": jnp.ones((4,))}
    opt = rowwise_adagrad(0.01)
    state = opt.init(params)
    # 1-D (V,): a (V, 1) column would be lane-padded 1->128 on TPU
    assert state.acc["emb_table"].shape == (100,)
    assert state.acc["bias"].shape == (4,)
    grads = {"emb_table": jnp.ones((100, 16)), "bias": jnp.ones((4,))}
    updates, state2 = opt.update(grads, state, params)
    assert updates["emb_table"].shape == (100, 16)
    assert np.all(np.asarray(updates["emb_table"]) < 0)  # descent direction
    # accumulator grew by mean(g^2)=1
    np.testing.assert_allclose(np.asarray(state2.acc["emb_table"]), 1.1, rtol=1e-6)


@pytest.mark.parametrize("make_opt", [
    lambda: ftrl(0.1),
    lambda: rowwise_adagrad(0.5),
    lambda: embedding_split_optimizer(),
    lambda: dual_group_optimizer(),
])
def test_optimizers_reduce_quadratic(make_opt):
    """Every optimizer must make progress on a quadratic with an 'emb_'-named
    table and a dense leaf."""
    opt = make_opt()
    params = {"emb_t": jnp.full((8, 4), 3.0), "linear_w": jnp.full((4,), -2.0)}

    def loss_fn(p):
        return sum(jnp.sum(x * x) for x in jax.tree.leaves(p))

    state = opt.init(params)
    losses = [float(loss_fn(params))]
    for _ in range(50):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss_fn(params)))
    # strict descent every step on a convex quadratic
    assert all(b < a for a, b in zip(losses, losses[1:])), losses[:5]


def test_resolve_named():
    from deepctr_tpu.training.optimizers import FusedOptimizer

    for name in ["sgd", "adam", "adagrad", "rmsprop", "ftrl", "rowwise_adagrad",
                 "ctr_default"]:
        assert isinstance(resolve_optimizer(name),
                          (optax.GradientTransformation, FusedOptimizer))
    with pytest.raises(ValueError):
        resolve_optimizer("nope")


def test_model_trains_with_ctr_default():
    from deepctr_tpu.models import DeepFM
    from tests.utils import SAMPLE_SIZE, get_test_data

    x, y, feature_columns = get_test_data(SAMPLE_SIZE, sparse_feature_num=2,
                                          dense_feature_num=1)
    model = DeepFM(feature_columns, feature_columns, dnn_hidden_units=(8,))
    model.compile("ctr_default", "binary_crossentropy")
    hist = model.fit(x, y, batch_size=8, epochs=5, verbose=0)
    assert len(hist.history["loss"]) == 5
    assert np.isfinite(hist.history["loss"][-1])
