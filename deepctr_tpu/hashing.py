"""Host-side feature hashing.

TPUs have no string ops, so on-the-fly hashing (reference ``Hash`` layer,
layers/utils.py:41-121) runs on the host inside the input pipeline, before
batches are shipped to the device. Semantics preserved:

- values are stringified, then hashed into ``num_buckets`` buckets
- ``mask_zero=True``: bucket count becomes ``num_buckets - 1``; the value
  "0"/"0.0" maps to bucket 0 and everything else to [1, num_buckets)
  (reference utils.py:101-110: ``(hash + 1) * (x != "0")``)
- ``vocabulary_path``: CSV of ``value,key`` rows; exact-match lookup with
  default 0 for misses (reference utils.py:80-82 TextFileInitializer with
  key_index=1, value_index=0)

The hash is a deterministic 64-bit FNV-1a over the UTF-8 bytes (stable across
processes, unlike Python's builtin ``hash``). It is not bit-identical to TF's
Fingerprint64 — bucket *assignment* differs but the statistical behavior and
the masking/vocab semantics match.
"""
from __future__ import annotations

import functools
import os

import numpy as np

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def fnv1a_64(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h ^= b
        h = (h * _FNV_PRIME) & _MASK64
    return h


@functools.lru_cache(maxsize=1 << 20)
def _hash_str(s: str) -> int:
    return fnv1a_64(s.encode("utf-8"))


@functools.lru_cache(maxsize=64)
def load_vocabulary(path: str):
    """Load a ``value,key`` CSV vocabulary (reference Hash docstring format)."""
    if not os.path.exists(path):
        raise FileNotFoundError("vocabulary_path not found: {}".format(path))
    table = {}
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            value, key = line.split(",", 1)
            table[key] = int(value)
    return table


def _stringify(arr: np.ndarray) -> np.ndarray:
    """Match TF's tf.as_string formatting for the dtypes DeepCTR feeds."""
    if arr.dtype.kind in ("U", "S", "O"):
        return arr.astype(str)
    if arr.dtype.kind in ("i", "u"):
        return arr.astype(np.int64).astype(str)
    # tf.as_string formats floats with 6 decimal places by default
    flat = np.array(["%.6f" % v for v in arr.astype(np.float64).ravel()])
    return flat.reshape(arr.shape)


def hash_array(arr, num_buckets: int, mask_zero: bool = False, vocabulary_path=None) -> np.ndarray:
    """Vectorized host-side equivalent of the reference ``Hash`` layer call."""
    arr = np.asarray(arr)
    str_arr = _stringify(arr)

    # hash/lookup only the unique values, then scatter back
    uniq, inv = np.unique(str_arr, return_inverse=True)

    if vocabulary_path:
        table = load_vocabulary(vocabulary_path)
        uniq_ids = np.array([table.get(u, 0) for u in uniq], dtype=np.int64)
        return uniq_ids[inv].reshape(arr.shape).astype(np.int32)

    buckets = num_buckets - 1 if mask_zero else num_buckets
    uniq_ids = None
    if len(uniq) > 256:
        # native vectorized FNV-1a (bit-identical); None if lib unavailable
        from . import native

        native_out = native.hash_strings(list(uniq), buckets, mask_zero=False)
        if native_out is not None:
            uniq_ids = native_out.astype(np.int64)
    if uniq_ids is None:
        uniq_ids = np.array([_hash_str(u) % buckets for u in uniq], dtype=np.int64)
    out = uniq_ids[inv].reshape(arr.shape)
    if mask_zero:
        zero_repr = _stringify(np.zeros([1], dtype=arr.dtype if arr.dtype.kind in "iuf" else np.int32))[0]
        not_zero = (str_arr != zero_repr).astype(np.int64)
        out = (out + 1) * not_zero
    return out.astype(np.int32)
