"""Host input pipeline: batching with static shapes.

Every batch shipped to the device has the SAME shape (batch_size): the final
partial batch is padded and masked via zero sample-weights, so jit compiles
exactly one program per batch size. This replaces the dynamic last-batch
shapes Keras tolerates (retracing is expensive under XLA).
"""
from __future__ import annotations

import numpy as np


def train_valid_split(x_dict, y, w, validation_split):
    """Keras semantics: the LAST fraction of the (unshuffled) data is held out."""
    n = len(y)
    split_at = int(n * (1.0 - validation_split))
    x_tr = {k: v[:split_at] for k, v in x_dict.items()}
    x_va = {k: v[split_at:] for k, v in x_dict.items()}
    return (x_tr, y[:split_at], w[:split_at]), (x_va, y[split_at:], w[split_at:])


def num_batches(n, batch_size):
    return (n + batch_size - 1) // batch_size


def iterate_batches(x_dict, y=None, w=None, batch_size=256, shuffle=False, rng=None):
    """Yield dicts of fixed-shape numpy batches.

    Each yield: (x_batch, y_batch, w_batch) where padding rows have w == 0.
    When ``y`` is None only x/w are meaningful (prediction path).
    """
    n = len(next(iter(x_dict.values())))
    idx = np.arange(n)
    if shuffle:
        (rng or np.random).shuffle(idx)
    for start in range(0, n, batch_size):
        take = idx[start : start + batch_size]
        pad = batch_size - len(take)
        if pad > 0:
            take = np.concatenate([take, np.repeat(take[-1:], pad)])
        xb = {k: v[take] for k, v in x_dict.items()}
        if y is not None:
            yb = y[take]
        else:
            yb = None
        if w is not None:
            wb = w[take].copy()
        else:
            wb = np.ones(batch_size, np.float32)
        if pad > 0:
            wb[batch_size - pad :] = 0.0
        yield xb, yb, wb, batch_size - pad
