"""Losses and metrics for the fit/evaluate driver.

Device-side: per-batch weighted losses (jit-traced, static shapes, padding
handled by zero sample-weights). Host-side: exact epoch metrics (AUC via full
sort, like the reference's offline sklearn usage, docs Examples.md:69-70).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-7


# --------------------------- device-side losses ---------------------------


def binary_crossentropy(y_true, y_pred, weight):
    p = jnp.clip(y_pred.reshape(-1), _EPS, 1.0 - _EPS)
    y = y_true.reshape(-1)
    ll = -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
    return jnp.sum(ll * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def mse(y_true, y_pred, weight):
    d = y_pred.reshape(-1) - y_true.reshape(-1)
    return jnp.sum(d * d * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def mae(y_true, y_pred, weight):
    d = jnp.abs(y_pred.reshape(-1) - y_true.reshape(-1))
    return jnp.sum(d * weight) / jnp.maximum(jnp.sum(weight), 1.0)


LOSSES = {
    "binary_crossentropy": binary_crossentropy,
    "bce": binary_crossentropy,
    "logloss": binary_crossentropy,
    "mse": mse,
    "mean_squared_error": mse,
    "mae": mae,
    "mean_absolute_error": mae,
}


def resolve_loss(loss):
    if callable(loss):
        return loss
    if isinstance(loss, str):
        if loss not in LOSSES:
            raise ValueError("Unknown loss '{}'".format(loss))
        return LOSSES[loss]
    raise ValueError("loss must be a string or callable, got {!r}".format(loss))


# --------------------------- host-side metrics ----------------------------


def auc_score(y_true, y_pred):
    """Exact ROC-AUC via rank statistic (ties handled by average rank)."""
    y_true = np.asarray(y_true, np.float64).reshape(-1)
    y_pred = np.asarray(y_pred, np.float64).reshape(-1)
    pos = y_true > 0.5
    n_pos = int(pos.sum())
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    order = np.argsort(y_pred, kind="mergesort")
    ranks = np.empty(len(y_pred), np.float64)
    sorted_pred = y_pred[order]
    # average ranks for ties
    i = 0
    r = np.arange(1, len(y_pred) + 1, dtype=np.float64)
    while i < len(y_pred):
        j = i
        while j + 1 < len(y_pred) and sorted_pred[j + 1] == sorted_pred[i]:
            j += 1
        r[i : j + 1] = 0.5 * (i + 1 + j + 1)
        i = j + 1
    ranks[order] = r
    sum_pos_ranks = ranks[pos].sum()
    return (sum_pos_ranks - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def logloss_score(y_true, y_pred):
    y_true = np.asarray(y_true, np.float64).reshape(-1)
    p = np.clip(np.asarray(y_pred, np.float64).reshape(-1), _EPS, 1 - _EPS)
    return float(-(y_true * np.log(p) + (1 - y_true) * np.log(1 - p)).mean())


def mse_score(y_true, y_pred):
    d = np.asarray(y_pred, np.float64).reshape(-1) - np.asarray(y_true, np.float64).reshape(-1)
    return float((d * d).mean())


def mae_score(y_true, y_pred):
    d = np.asarray(y_pred, np.float64).reshape(-1) - np.asarray(y_true, np.float64).reshape(-1)
    return float(np.abs(d).mean())


def accuracy_score(y_true, y_pred):
    y_true = np.asarray(y_true).reshape(-1)
    y_hat = (np.asarray(y_pred).reshape(-1) > 0.5).astype(np.float64)
    return float((y_hat == y_true).mean())


HOST_METRICS = {
    "auc": auc_score,
    "AUC": auc_score,
    "binary_crossentropy": logloss_score,
    "logloss": logloss_score,
    "crossentropy": logloss_score,
    "mse": mse_score,
    "mean_squared_error": mse_score,
    "mae": mae_score,
    "mean_absolute_error": mae_score,
    "accuracy": accuracy_score,
    "acc": accuracy_score,
}


def resolve_metric(name):
    if callable(name):
        return name
    if name in HOST_METRICS:
        return HOST_METRICS[name]
    raise ValueError("Unknown metric '{}'".format(name))
