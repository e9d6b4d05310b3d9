"""Generic layer harness — the flax analogue of the reference Keras
``layer_test`` (reference tests/utils.py:108-276): init, forward, output
shape/dtype checks, deterministic re-apply equality, and a grad pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def layer_test(layer_cls, kwargs=None, input_shape=None, input_data=None,
               expected_output_shape=None, rngs=None, training=False,
               method_kwargs=None):
    """Instantiate ``layer_cls(**kwargs)``, run it on random input(s), check
    the output shape, check determinism, and check gradients flow.

    ``input_shape`` may be a tuple or a list of tuples (list-input layers).
    Returns the layer output.
    """
    kwargs = kwargs or {}
    method_kwargs = method_kwargs or {}
    rng = np.random.RandomState(42)

    if input_data is None:
        assert input_shape is not None
        if isinstance(input_shape, list):
            input_data = [rng.standard_normal(s).astype(np.float32) for s in input_shape]
        else:
            input_data = rng.standard_normal(input_shape).astype(np.float32)

    if isinstance(input_data, list):
        x = [jnp.asarray(a) for a in input_data]
    else:
        x = jnp.asarray(input_data)

    layer = layer_cls(**kwargs)
    init_rngs = rngs or {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    variables = layer.init(init_rngs, x, **method_kwargs)
    out, _ = layer.apply(
        variables, x, mutable=["losses", "batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)}, **method_kwargs,
    )

    def _check_shape(o):
        if expected_output_shape is not None:
            got = tuple(o.shape)
            want = tuple(expected_output_shape)
            assert len(got) == len(want), (got, want)
            for g, w in zip(got, want):
                if w is not None:
                    assert g == w, "shape mismatch: got %s want %s" % (got, want)

    if isinstance(out, (list, tuple)):
        if expected_output_shape is not None:
            for o in out:
                _check_shape(o)
    else:
        _check_shape(out)

    # determinism: same variables + rngs -> identical output
    out2, _ = layer.apply(
        variables, x, mutable=["losses", "batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)}, **method_kwargs,
    )
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(out2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # gradient pass: sum(output) differentiable w.r.t. params (when any)
    params = variables.get("params")
    if params:
        def loss_fn(p):
            o, _ = layer.apply(
                {**variables, "params": p}, x, mutable=["losses", "batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)}, **method_kwargs,
            )
            return sum(jnp.sum(t) for t in jax.tree.leaves(o))

        grads = jax.grad(loss_fn)(params)
        for g in jax.tree.leaves(grads):
            assert np.all(np.isfinite(np.asarray(g))), "non-finite gradient"

    return out
