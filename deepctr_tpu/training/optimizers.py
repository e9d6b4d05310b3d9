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
    Accumulators are 1-D ``(V,)``: a ``(V, 1)`` column would be lane-padded
    1 -> 128 by the TPU's T(8,128) tiling, costing 128x its logical bytes
    per pass. Non-2D leaves fall back to element-wise adagrad.
    """

    class RowwiseAdagradState(NamedTuple):
        acc: optax.Updates

    def row_init(p):
        if getattr(p, "ndim", 0) == 2:
            return jnp.full((p.shape[0],), initial_accumulator_value, jnp.float32)
        return jnp.full_like(p, initial_accumulator_value)

    def init_fn(params):
        return RowwiseAdagradState(acc=jax.tree.map(row_init, params))

    def update_fn(grads, state, params=None):
        flat_g, treedef = jax.tree.flatten(grads)
        flat_a = treedef.flatten_up_to(state.acc)
        ups, accs = [], []
        for g, a in zip(flat_g, flat_a):
            if g.ndim == 2 and a.ndim == 1:
                a_new = a + jnp.mean(g * g, axis=1)
                scale = jax.lax.rsqrt(a_new + eps)[:, None]
            else:
                a_new = a + g * g
                scale = jax.lax.rsqrt(a_new + eps)
            ups.append(-learning_rate * g * scale)
            accs.append(a_new)
        return treedef.unflatten(ups), RowwiseAdagradState(acc=treedef.unflatten(accs))

    return optax.GradientTransformation(init_fn, update_fn)


class FusedOptimizer:
    """optax-compatible transform (``init``/``update``) that ALSO offers
    ``fused_apply(grads, state, params) -> (new_params, new_state)``.

    ``fused_apply`` computes the new parameters in the same expression as
    the optimizer math, so no ``updates`` tree is ever materialized. On TPU
    this matters twice over: the avoided f32 updates for a (V, E) table are
    a full extra HBM pass, and with E < 128 the array's minor dimension is
    lane-padded (T(8,128) tiling) so that pass costs up to 128/E x its
    logical bytes. The train step uses ``fused_apply`` when present
    (training/model.py), and falls back to update+optax.apply_updates.
    """

    def __init__(self, init, update, fused_apply):
        self.init = init
        self.update = update
        self.fused_apply = fused_apply


class EmbeddingSplitState(NamedTuple):
    dense: object   # dense_opt state over the non-embedding subtree
    emb_acc: object  # rowwise-adagrad accumulators, (V,) f32 per 2-D table


def embedding_split_optimizer(dense_opt=None, embedding_opt=None,
                              embedding_lr=0.01, eps=1e-10,
                              initial_accumulator_value=0.1):
    """Dense params -> ``dense_opt`` (default adam); embedding tables (param
    name prefix ``emb_``) -> row-wise adagrad with a fused apply.

    This is the recommended TPU training configuration: full-state adaptive
    optimizers on the (small) dense tower, O(rows) optimizer state on the
    (huge) embedding tables. Accumulators are stored as 1-D ``(V,)`` arrays:
    a ``(V, 1)`` f32 column picks up a T(8,128)-tiled layout whose minor
    dimension is padded 1 -> 128, so every accumulator pass would touch 128x
    its logical bytes (profiled at ~4 ms/step on the criteo shape).

    Passing an explicit ``embedding_opt`` falls back to the generic (and
    slower) ``optax.multi_transform`` composition with no fused apply.
    """
    dense_opt_was_default = dense_opt is None
    dense_opt = dense_opt or optax.adam(0.001, b1=0.9, b2=0.999, eps=1e-7)
    if embedding_opt is not None:
        def make_labels(params):
            return jax.tree_util.tree_map_with_path(
                lambda p, _: "emb"
                if any(str(getattr(k, "key", k)).startswith("emb_") for k in p)
                else "dense",
                params,
            )

        return optax.multi_transform({"dense": dense_opt, "emb": embedding_opt},
                                     make_labels)

    from flax.traverse_util import flatten_dict, unflatten_dict

    def _is_emb(path):
        return any(str(k).startswith("emb_") for k in path)

    def _split(tree):
        flat = flatten_dict(dict(tree))
        emb = {p: v for p, v in flat.items() if _is_emb(p)}
        dense = {p: v for p, v in flat.items() if p not in emb}
        return emb, dense

    def _rowwise(g, acc):
        g = g.astype(jnp.float32)
        if g.ndim == 2 and acc.ndim == 1:
            a_new = acc + jnp.mean(g * g, axis=1)
            scale = jax.lax.rsqrt(a_new + eps)[:, None]
        else:
            a_new = acc + g * g
            scale = jax.lax.rsqrt(a_new + eps)
        return -embedding_lr * g * scale, a_new

    def _acc_init(p):
        shape = p.shape[:1] if getattr(p, "ndim", 0) == 2 else p.shape
        return jnp.full(shape, initial_accumulator_value, jnp.float32)

    def init_fn(params):
        emb, dense = _split(params)
        return EmbeddingSplitState(
            dense=dense_opt.init(unflatten_dict(dense)),
            emb_acc={p: _acc_init(v) for p, v in emb.items()},
        )

    def _dense_update(gdense, state, pdense):
        gtree = unflatten_dict(gdense)
        ptree = unflatten_dict(pdense) if pdense is not None else None
        ups, new_state = dense_opt.update(gtree, state, ptree)
        return flatten_dict(ups) if ups else {}, new_state

    def update_fn(grads, state, params=None):
        gemb, gdense = _split(grads)
        pdense = None
        if params is not None:
            _, pdense = _split(params)
        d_ups, d_state = _dense_update(gdense, state.dense, pdense)
        ups, accs = dict(d_ups), {}
        for p, g in gemb.items():
            ups[p], accs[p] = _rowwise(g, state.emb_acc[p])
        return (unflatten_dict(ups),
                EmbeddingSplitState(dense=d_state, emb_acc=accs))

    def fused_apply(grads, state, params, lr_scale=None):
        gemb, gdense = _split(grads)
        pemb, pdense = _split(params)
        d_ups, d_state = _dense_update(gdense, state.dense, pdense)
        new_flat, accs = {}, {}
        for p, w in pemb.items():
            u, accs[p] = _rowwise(gemb[p], state.emb_acc[p])
            if lr_scale is not None:
                u = u * lr_scale
            new_flat[p] = (w.astype(jnp.float32) + u).astype(w.dtype)
        for p, w in pdense.items():
            u = d_ups[p]
            if lr_scale is not None:
                u = u * lr_scale.astype(u.dtype)
            new_flat[p] = (w + u.astype(w.dtype)).astype(w.dtype)
        return (unflatten_dict(new_flat),
                EmbeddingSplitState(dense=d_state, emb_acc=accs))

    opt = FusedOptimizer(init_fn, update_fn, fused_apply)
    # callbacks' absolute-LR semantics key off the dense tower's configured
    # rate (the embedding rowwise-adagrad rate scales proportionally)
    opt.base_learning_rate = 0.001 if dense_opt_was_default else None
    return opt


class MutableLR:
    """Runtime-mutable learning rate (Keras ``optimizer.learning_rate``
    parity, consumed by LearningRateScheduler / ReduceLROnPlateau).

    Wraps a resolved optimizer so the LR can change BETWEEN steps without
    retracing: the opt state becomes ``(inner_state, lr_scale)`` where
    ``lr_scale`` is a traced f32 scalar multiplying every update. Standard
    update rules are linear in the learning rate (update = -lr * f(stats)),
    so scaling updates IS scaling the LR while accumulator statistics stay
    exactly what the un-scaled optimizer would hold. Retracing matters
    here: a per-epoch recompile costs seconds-to-minutes on the remote TPU
    backend, a traced scalar costs one fused multiply.

    ``base_learning_rate`` records the wrapped optimizer's configured rate
    when known (named optimizers / default embedding split), so
    ``model.learning_rate`` can speak absolute values; when unknown, the
    model-level property degrades to multiplier semantics.
    """

    def __init__(self, inner, base_learning_rate=None,
                 lr_scale_unsafe=False):
        self.inner = inner
        self.base_learning_rate = base_learning_rate
        # FTRL-proximal's update is NOT linear in lr (lr sits inside the
        # sigma and denominator terms); scaling its updates is not
        # equivalent to FTRL at the scaled rate — the model warns on use.
        # Set via lr_scale_unsafe_of at compile; custom FTRL compositions
        # inside plain GradientTransformations go undetected.
        self.lr_scale_unsafe = lr_scale_unsafe or getattr(
            inner, "lr_scale_unsafe", False)
        if getattr(inner, "fused_apply", None) is not None:
            self.fused_apply = self._fused_apply

    def init(self, params):
        return (self.inner.init(params), jnp.float32(1.0))

    @staticmethod
    def get_scale(opt_state):
        return opt_state[1]

    @staticmethod
    def set_scale(opt_state, scale):
        return (opt_state[0], jnp.asarray(scale, jnp.float32))

    def update(self, grads, state, params=None):
        inner_state, scale = state
        ups, new_inner = self.inner.update(grads, inner_state, params)
        ups = jax.tree.map(lambda u: (u * scale.astype(u.dtype)), ups)
        return ups, (new_inner, scale)

    def _fused_apply(self, grads, state, params):
        inner_state, scale = state
        new_params, new_inner = self.inner.fused_apply(
            grads, inner_state, params, lr_scale=scale)
        return new_params, (new_inner, scale)


_NAMED_BASE_LR = {
    "sgd": 0.01, "adam": 0.001, "adamw": 0.001, "adagrad": 0.01,
    "rmsprop": 0.001, "ftrl": 0.005, "rowwise_adagrad": 0.01,
    "ctr_default": 0.001,
}


def base_learning_rate_of(opt_spec, resolved):
    """Best-effort configured LR of an optimizer spec: known for names and
    for transforms that carry ``base_learning_rate``; None otherwise."""
    if isinstance(opt_spec, str):
        return _NAMED_BASE_LR.get(opt_spec)
    return getattr(resolved, "base_learning_rate", None)


def lr_scale_unsafe_of(opt_spec, resolved):
    """True when runtime LR scaling is not equivalent to the optimizer at
    the scaled rate (FTRL-proximal: lr sits inside sigma and the
    denominator, so the update is not linear in it). Detectable for the
    named spec and for objects carrying ``lr_scale_unsafe``; a raw
    GradientTransformation (frozen NamedTuple) cannot carry the flag, so
    custom FTRL compositions go undetected — documented in MutableLR."""
    if isinstance(opt_spec, str):
        return opt_spec.lower() == "ftrl"
    return bool(getattr(resolved, "lr_scale_unsafe", False))


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
    """Accept a name ('adam', ...), any optax.GradientTransformation, or a
    FusedOptimizer (embedding_split_optimizer's fused-apply form)."""
    if isinstance(opt, str):
        if opt not in _NAMED:
            raise ValueError("Unknown optimizer '{}'".format(opt))
        return _NAMED[opt]()
    if isinstance(opt, (optax.GradientTransformation, FusedOptimizer)):
        return opt
    raise ValueError("optimizer must be a name or optax transformation")


def apply_optimizer(optimizer, grads, opt_state, params):
    """One optimizer step -> (new_params, new_opt_state).

    Uses the optimizer's ``fused_apply`` when it has one (new params are
    computed in the same fused expression as the optimizer math — no
    materialized updates tree); otherwise the standard optax
    update + apply_updates pair."""
    if getattr(optimizer, "fused_apply", None) is not None:
        return optimizer.fused_apply(grads, opt_state, params)
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt_state


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
