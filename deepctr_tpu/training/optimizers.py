"""Optimizers: name resolution, FTRL, and the dual-group transform.

The reference Estimator path trains the wide tower with FTRL (lr 0.005) and
the deep tower with Adagrad (lr 0.01), split by variable scope
(estimator/utils.py:121-162). Here the split is an ``optax.multi_transform``
over param-path labels ('linear' vs 'dnn').
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def ftrl(learning_rate=0.005, learning_rate_power=-0.5, initial_accumulator_value=0.1,
         l1_regularization_strength=0.0, l2_regularization_strength=0.0):
    """FTRL-Proximal (McMahan et al. 2013), matching TF's FtrlOptimizer update."""

    class FtrlState(NamedTuple):
        n: optax.Updates  # accumulated squared gradients
        z: optax.Updates  # linear term

    def init_fn(params):
        n = jax.tree.map(lambda p: jnp.full_like(p, initial_accumulator_value), params)
        z = jax.tree.map(jnp.zeros_like, params)
        return FtrlState(n=n, z=z)

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("ftrl requires params")
        lr = learning_rate
        lp = learning_rate_power
        l1 = l1_regularization_strength
        l2 = l2_regularization_strength

        def upd(g, n, z, w):
            n_new = n + g * g
            sigma = (n_new ** (-lp) - n ** (-lp)) / lr
            z_new = z + g - sigma * w
            # closed-form proximal step
            w_new = jnp.where(
                jnp.abs(z_new) <= l1,
                jnp.zeros_like(w),
                -(z_new - jnp.sign(z_new) * l1) / ((n_new ** (-lp)) / lr + 2 * l2),
            )
            return n_new, z_new, w_new - w

        flat_g, treedef = jax.tree.flatten(grads)
        flat_n = treedef.flatten_up_to(state.n)
        flat_z = treedef.flatten_up_to(state.z)
        flat_p = treedef.flatten_up_to(params)
        new_n, new_z, updates = [], [], []
        for g, n, z, w in zip(flat_g, flat_n, flat_z, flat_p):
            nn_, zn_, up_ = upd(g, n, z, w)
            new_n.append(nn_)
            new_z.append(zn_)
            updates.append(up_)
        return (
            treedef.unflatten(updates),
            FtrlState(n=treedef.unflatten(new_n), z=treedef.unflatten(new_z)),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def rowwise_adagrad(learning_rate=0.01, eps=1e-10, initial_accumulator_value=0.1):
    """Row-wise Adagrad for embedding tables (the DLRM-standard embedding
    optimizer): one accumulator scalar PER ROW instead of per element, so the
    optimizer-state HBM traffic for a (V, E) table drops from O(V*E) to O(V).
    Non-2D leaves fall back to element-wise adagrad.
    """

    class RowwiseAdagradState(NamedTuple):
        acc: optax.Updates

    def row_init(p):
        if getattr(p, "ndim", 0) == 2:
            return jnp.full((p.shape[0], 1), initial_accumulator_value, jnp.float32)
        return jnp.full_like(p, initial_accumulator_value)

    def init_fn(params):
        return RowwiseAdagradState(acc=jax.tree.map(row_init, params))

    def update_fn(grads, state, params=None):
        flat_g, treedef = jax.tree.flatten(grads)
        flat_a = treedef.flatten_up_to(state.acc)
        ups, accs = [], []
        for g, a in zip(flat_g, flat_a):
            if g.ndim == 2 and a.shape != g.shape:
                a_new = a + jnp.mean(g * g, axis=1, keepdims=True)
            else:
                a_new = a + g * g
            ups.append(-learning_rate * g * jax.lax.rsqrt(a_new + eps))
            accs.append(a_new)
        return treedef.unflatten(ups), RowwiseAdagradState(acc=treedef.unflatten(accs))

    return optax.GradientTransformation(init_fn, update_fn)


def embedding_split_optimizer(dense_opt=None, embedding_opt=None):
    """Dense params -> ``dense_opt`` (default adam); embedding tables (param
    name prefix ``emb_``) -> ``embedding_opt`` (default rowwise_adagrad).

    This is the recommended TPU training configuration: full-state adaptive
    optimizers on the (small) dense tower, O(rows) optimizer state on the
    (huge) embedding tables.
    """
    dense_opt = dense_opt or optax.adam(0.001, b1=0.9, b2=0.999, eps=1e-7)
    embedding_opt = embedding_opt or rowwise_adagrad(0.01)

    def make_labels(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: "emb"
            if any(str(getattr(k, "key", k)).startswith("emb_") for k in p)
            else "dense",
            params,
        )

    return optax.multi_transform({"dense": dense_opt, "emb": embedding_opt},
                                 make_labels)


_NAMED = {
    "sgd": lambda: optax.sgd(0.01),
    "adam": lambda: optax.adam(0.001, b1=0.9, b2=0.999, eps=1e-7),
    "adamw": lambda: optax.adamw(0.001),
    "adagrad": lambda: optax.adagrad(0.01, initial_accumulator_value=0.1, eps=1e-7),
    "rmsprop": lambda: optax.rmsprop(0.001),
    "ftrl": lambda: ftrl(0.005),
    "rowwise_adagrad": lambda: rowwise_adagrad(0.01),
    # adam on the dense tower + rowwise adagrad on embedding tables —
    # the recommended high-throughput TPU configuration
    "ctr_default": embedding_split_optimizer,
}


def resolve_optimizer(opt):
    """Accept a name ('adam', ...) or any optax.GradientTransformation."""
    if isinstance(opt, str):
        if opt not in _NAMED:
            raise ValueError("Unknown optimizer '{}'".format(opt))
        return _NAMED[opt]()
    if isinstance(opt, optax.GradientTransformation):
        return opt
    raise ValueError("optimizer must be a name or optax transformation")


def dual_group_optimizer(linear_opt=None, dnn_opt=None, label_fn=None):
    """FTRL-for-linear / Adagrad-for-deep split (estimator/utils.py:122-162).

    ``label_fn(path_tuple) -> 'linear' | 'dnn'`` defaults to matching params
    whose path mentions the linear tower.
    """
    linear_opt = linear_opt or ftrl(0.005)
    dnn_opt = dnn_opt or optax.adagrad(0.01, initial_accumulator_value=0.1, eps=1e-7)

    if label_fn is None:
        def label_fn(path):
            return "linear" if any("linear" in str(k) for k in path) else "dnn"

    def make_labels(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: label_fn(tuple(str(k) for k in p)), params
        )

    return optax.multi_transform({"linear": linear_opt, "dnn": dnn_opt}, make_labels)
