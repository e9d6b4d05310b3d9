"""Shared helpers for the example scripts.

Sample datasets are the ones bundled with the reference checkout (criteo /
avazu / movielens / census samples); point DEEPCTR_TPU_DATA elsewhere to use
your own copies.
"""
from __future__ import annotations

import os

import numpy as np

DATA_DIR = os.environ.get("DEEPCTR_TPU_DATA", "/root/reference/examples")


def data_path(name: str) -> str:
    return os.path.join(DATA_DIR, name)


def pad_sequences(sequences, maxlen, padding="post", value=0, dtype=None):
    """Minimal stand-in for keras.preprocessing.sequence.pad_sequences."""
    n = len(sequences)
    sample = next((s for s in sequences if len(s)), [value])
    if dtype is None:
        dtype = object if isinstance(sample[0], str) else np.int64
    out = np.full((n, maxlen), value, dtype=dtype)
    for i, seq in enumerate(sequences):
        seq = list(seq)[:maxlen]
        if padding == "post":
            out[i, :len(seq)] = seq
        else:
            out[i, maxlen - len(seq):] = seq
    return out
