"""Core layer unit tests (reference tests/layers/core_test.py + activation)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepctr_tpu.layers.activation import Dice, activation_fn
from deepctr_tpu.layers.core import (
    DNN,
    LocalActivationUnit,
    PredictionLayer,
    RegulationModule,
)
from deepctr_tpu.layers.normalization import LayerNormalization
from deepctr_tpu.layers.utils import Linear

from .layer_harness import layer_test

B, E = 4, 8


@pytest.mark.parametrize("hidden_units,use_bn,activation",
                         [((16, 8), False, "relu"), ((8,), True, "relu"),
                          ((8,), False, "dice"), ((), False, "sigmoid")])
def test_DNN(hidden_units, use_bn, activation):
    want = hidden_units[-1] if hidden_units else 12
    layer_test(DNN, kwargs={"hidden_units": hidden_units, "use_bn": use_bn,
                            "activation": activation, "dropout_rate": 0.5},
               input_shape=(B, 12), expected_output_shape=(B, want),
               method_kwargs={"training": True})


def test_DNN_output_activation():
    out = layer_test(DNN, kwargs={"hidden_units": (8, 4),
                                  "output_activation": "sigmoid"},
                     input_shape=(B, 12))
    arr = np.asarray(out)
    assert np.all((arr >= 0) & (arr <= 1))


@pytest.mark.parametrize("hidden_units", [(8, 4), ()])
def test_LocalActivationUnit(hidden_units):
    rng = np.random.RandomState(0)
    query = rng.standard_normal((B, 1, E)).astype(np.float32)
    keys = rng.standard_normal((B, 5, E)).astype(np.float32)
    layer = LocalActivationUnit(hidden_units=hidden_units)
    variables = layer.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(query), jnp.asarray(keys))
    out = layer.apply(variables, jnp.asarray(query), jnp.asarray(keys))
    assert out.shape == (B, 5, 1)


@pytest.mark.parametrize("task", ["binary", "regression"])
def test_PredictionLayer(task):
    out = layer_test(PredictionLayer, kwargs={"task": task}, input_shape=(B, 1),
                     expected_output_shape=(B, 1))
    if task == "binary":
        arr = np.asarray(out)
        assert np.all((arr >= 0) & (arr <= 1))


def test_PredictionLayer_invalid_task():
    with pytest.raises(ValueError):
        layer_test(PredictionLayer, kwargs={"task": "rank"}, input_shape=(B, 1))


def test_RegulationModule():
    layer_test(RegulationModule, kwargs={"tau": 1.0}, input_shape=(B, 5, E),
               expected_output_shape=(B, 5 * E))


def test_Dice():
    layer_test(Dice, input_shape=(B, E), expected_output_shape=(B, E),
               method_kwargs={"training": True})


def test_activation_fn_resolvers():
    assert np.allclose(np.asarray(activation_fn("linear")(jnp.ones(3))), 1.0)
    with pytest.raises(ValueError):
        activation_fn("not_an_activation")


def test_LayerNormalization():
    out = layer_test(LayerNormalization, input_shape=(B, 5, E),
                     expected_output_shape=(B, 5, E))
    arr = np.asarray(out)
    np.testing.assert_allclose(arr.mean(-1), 0.0, atol=1e-4)


def test_Linear_modes():
    rng = np.random.RandomState(0)
    sparse = jnp.asarray(rng.standard_normal((B, 1, 6)).astype(np.float32))
    dense = jnp.asarray(rng.standard_normal((B, 3)).astype(np.float32))
    for mode, args in [(0, (sparse, None)), (1, (None, dense)), (2, (sparse, dense))]:
        layer = Linear(mode=mode, use_bias=True)
        variables = layer.init({"params": jax.random.PRNGKey(0)}, *args)
        out = layer.apply(variables, *args)
        assert out.shape == (B, 1)


def test_migration_shims_nomask_concat_reduce():
    """NoMask/Concat/reduce_*/div drop-in parity (reference
    layers/utils.py:26-39,189-233,245-310)."""
    import jax.numpy as jnp
    import numpy as np

    from deepctr_tpu.layers import (Concat, NoMask, div, reduce_max,
                                    reduce_mean, reduce_sum)

    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(2, 3))
    assert (NoMask()(x) == x).all()
    cat = Concat(axis=-1)([x, x])
    assert cat.shape == (2, 6)
    np.testing.assert_allclose(reduce_sum(x, axis=1, keep_dims=True),
                               np.sum(np.asarray(x), 1, keepdims=True))
    np.testing.assert_allclose(reduce_mean(x, axis=0), np.mean(np.asarray(x), 0))
    np.testing.assert_allclose(reduce_max(x), np.max(np.asarray(x)))
    np.testing.assert_allclose(div(x, jnp.full_like(x, 2.0)), np.asarray(x) / 2)
