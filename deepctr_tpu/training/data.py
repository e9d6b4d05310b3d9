"""Host input pipeline: batching with static shapes.

Every batch shipped to the device has the SAME shape (batch_size): the final
partial batch is padded and masked via zero sample-weights, so jit compiles
exactly one program per batch size. This replaces the dynamic last-batch
shapes Keras tolerates (retracing is expensive under XLA).
"""
from __future__ import annotations

import numpy as np


def is_stream(x):
    """True for streaming inputs: a zero-arg ``input_fn`` callable (the
    estimator-tier contract, estimator/inputs.py) or any iterator/generator
    of ``(features_dict, labels[, sample_weight])`` batches (the Keras
    ``fit(generator)`` contract the reference inherits from tf.keras).
    In-memory mappings / DataFrames / arrays are not streams."""
    if hasattr(x, "keys"):  # dict / DataFrame
        return False
    return callable(x) or hasattr(x, "__next__")


class StreamSource:
    """Adapts a streaming input into fixed-shape epoch iterators.

    The first yielded batch fixes the static batch size; smaller (trailing)
    batches are padded with repeated rows and zero sample-weights so jit
    compiles exactly one program (same contract as ``iterate_batches``).

    Epoch semantics:
      - input_fn callable + no steps: each epoch is one pass of the
        input_fn's iterator (restarted per epoch).
      - input_fn callable + steps: the iterator keeps running across
        epochs (the tf.data ``repeat()`` + steps_per_epoch contract).
      - plain iterator: consumed continuously; once exhausted, subsequent
        epochs yield nothing (fit stops).
    """

    def __init__(self, source, canon_item):
        self._canon = canon_item  # (item, pad_to) -> (xb, yb, wb, n_real)
        self._factory = source if callable(source) else None
        self._it = None if self._factory else iter(source)
        self._pushback = None
        self.pad_to = None
        self.exhausted = False

    def _next_item(self):
        if self._pushback is not None:
            item, self._pushback = self._pushback, None
            return item
        if self._it is None:
            self._it = iter(self._factory())
        return next(self._it)

    def peek_batch(self):
        """First canonical batch (for model building) without consuming it."""
        item = self._next_item()
        self._pushback = item
        batch = self._canon(item, None)
        if self.pad_to is None:
            self.pad_to = len(batch[2])
        return batch

    def epoch(self, steps=None):
        count = 0
        while steps is None or count < steps:
            try:
                item = self._next_item()
            except StopIteration:
                if self._factory is not None and steps is None:
                    self._it = None  # restart the input_fn next epoch
                else:
                    self.exhausted = True
                return
            batch = self._canon(item, self.pad_to)
            if self.pad_to is None:
                self.pad_to = len(batch[2])
            yield batch
            count += 1


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
