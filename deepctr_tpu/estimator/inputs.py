"""Estimator input functions (reference estimator/inputs.py:4-52).

An ``input_fn`` here is a zero-arg callable returning an iterator of
``(features_dict, labels_or_None)`` numpy batches.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from .tfrecord import read_tfrecord_examples


@dataclasses.dataclass(frozen=True)
class FixedLenFeature:
    """Schema entry for TFRecord parsing (role of tf.io.FixedLenFeature)."""

    shape: Tuple[int, ...] = (1,)
    dtype: str = "int64"
    default_value: Optional[object] = None


def _batched(x_dict, y, batch_size, num_epochs, shuffle, seed=1024):
    """num_epochs=None repeats indefinitely (the tf.data `repeat()` contract
    the reference input_fns rely on) — bound iteration with train(steps=...)."""
    import itertools

    n = len(next(iter(x_dict.values())))
    rng = np.random.RandomState(seed)
    epochs = itertools.count() if num_epochs is None else range(max(1, num_epochs))
    for _ in epochs:
        idx = np.arange(n)
        if shuffle:
            rng.shuffle(idx)
        for start in range(0, n, batch_size):
            sel = idx[start:start + batch_size]
            xb = {k: v[sel] for k, v in x_dict.items()}
            yb = y[sel] if y is not None else None
            yield xb, yb


def input_fn_pandas(df, features, label=None, batch_size=256, num_epochs=1,
                    shuffle=False, queue_capacity_factor=10, num_threads=1):
    """Pandas DataFrame -> input_fn (reference estimator/inputs.py:4-19).

    queue_capacity_factor/num_threads kept for signature parity (the data is
    materialized up front; prefetching happens in the jit dispatch pipeline).
    """
    x_dict = {name: df[name].values for name in features}
    y = df[label].values.astype(np.float32) if label is not None else None

    def input_fn():
        return _batched(x_dict, y, batch_size, num_epochs, shuffle)

    return input_fn


def input_fn_tfrecord(filenames, feature_description, label=None, batch_size=256,
                      num_epochs=1, num_parallel_calls=8, shuffle_factor=10,
                      prefetch_factor=1):
    """TFRecord file(s) -> input_fn (reference estimator/inputs.py:22-52).

    STREAMING: files are mmap'd and decoded chunk-by-chunk (native C++
    parser), shuffled through a ``shuffle_factor * batch_size`` record pool
    and prefetched by a background thread — host memory stays
    O(shuffle buffer), independent of dataset size (estimator/streaming.py).
    ``num_parallel_calls`` is the number of native parser THREADS (rows
    split across them, bit-identical output) and scales the chunk
    granularity so the threads stay busy.
    """
    from .streaming import iter_tfrecord_batches, prefetched

    shuffle_buffer = batch_size * shuffle_factor if shuffle_factor else 0
    chunk_records = max(batch_size, 2048 * max(1, num_parallel_calls))

    def input_fn():
        it = iter_tfrecord_batches(
            filenames, feature_description, label=label,
            batch_size=batch_size, num_epochs=num_epochs,
            shuffle_buffer=shuffle_buffer, chunk_records=chunk_records,
            parse_threads=num_parallel_calls,
        )
        if prefetch_factor:
            it = prefetched(it, depth=prefetch_factor + 1)
        return it

    return input_fn
