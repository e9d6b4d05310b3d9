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

The default hash is **FarmHash64** — bit-identical to TF's Fingerprint64 /
``tf.strings.to_hash_bucket_fast`` (validated against TF 2.21 across every
length class), so hashed models assign the SAME buckets as the reference
and can be golden-checked against it. ``algorithm="fnv"`` keeps the
round-1 FNV-1a assignment for checkpoints trained with it.
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


# --------------------------- FarmHash64 ------------------------------------
# Reimplementation of the public FarmHash64 ("na") algorithm, the function
# behind TF's Fingerprint64 (reference layers/utils.py:89-112 uses
# tf.strings.to_hash_bucket_fast). Bit-exactness is covered by
# tests/hashing_test.py against the installed TF when available.

_M = _MASK64
_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F


def _rot(v, s):
    return ((v >> s) | (v << (64 - s))) & _M if s else v


def _f64(s, i):
    return int.from_bytes(s[i:i + 8], "little")


def _f32(s, i):
    return int.from_bytes(s[i:i + 4], "little")


def _smix(v):
    return (v ^ (v >> 47)) & _M


def _h16(u, v, mul):
    a = ((u ^ v) * mul) & _M
    a ^= a >> 47
    b = ((v ^ a) * mul) & _M
    b ^= b >> 47
    return (b * mul) & _M


def _h0to16(s, n):
    if n >= 8:
        mul = (_K2 + n * 2) & _M
        a = (_f64(s, 0) + _K2) & _M
        b = _f64(s, n - 8)
        c = (_rot(b, 37) * mul + a) & _M
        d = ((_rot(a, 25) + b) * mul) & _M
        return _h16(c, d, mul)
    if n >= 4:
        mul = (_K2 + n * 2) & _M
        a = _f32(s, 0)
        return _h16((n + (a << 3)) & _M, _f32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & _M
        z = (n + (c << 2)) & _M
        return (_smix((y * _K2 ^ z * _K0) & _M) * _K2) & _M
    return _K2


def _h17to32(s, n):
    mul = (_K2 + n * 2) & _M
    a = (_f64(s, 0) * _K1) & _M
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & _M
    d = (_f64(s, n - 16) * _K2) & _M
    return _h16((_rot((a + b) & _M, 43) + _rot(c, 30) + d) & _M,
                (a + _rot((b + _K2) & _M, 18) + c) & _M, mul)


def _h33to64(s, n):
    mul = (_K2 + n * 2) & _M
    a = (_f64(s, 0) * _K2) & _M
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & _M
    d = (_f64(s, n - 16) * _K2) & _M
    y = (_rot((a + b) & _M, 43) + _rot(c, 30) + d) & _M
    z = _h16(y, (a + _rot((b + _K2) & _M, 18) + c) & _M, mul)
    e = (_f64(s, 16) * mul) & _M
    f = _f64(s, 24)
    g = ((y + _f64(s, n - 32)) * mul) & _M
    h = ((z + _f64(s, n - 24)) * mul) & _M
    return _h16((_rot((e + f) & _M, 43) + _rot(g, 30) + h) & _M,
                (e + _rot((f + a) & _M, 18) + g) & _M, mul)


def _weak(s, i, a, b):
    w = _f64(s, i)
    x = _f64(s, i + 8)
    y = _f64(s, i + 16)
    z = _f64(s, i + 24)
    a = (a + w) & _M
    b = _rot((b + a + z) & _M, 21)
    c = a
    a = (a + x + y) & _M
    b = (b + _rot(a, 44)) & _M
    return (a + z) & _M, (b + c) & _M


def farmhash64(s: bytes) -> int:
    """FarmHash64 of a byte string (== TF Fingerprint64)."""
    n = len(s)
    if n <= 16:
        return _h0to16(s, n)
    if n <= 32:
        return _h17to32(s, n)
    if n <= 64:
        return _h33to64(s, n)
    seed = 81
    x = seed
    y = (seed * _K1 + 113) & _M
    z = (_smix((y * _K2 + 113) & _M) * _K2) & _M
    v0 = v1 = w0 = w1 = 0
    x = (x * _K2 + _f64(s, 0)) & _M
    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while True:
        x = (_rot((x + y + v0 + _f64(s, i + 8)) & _M, 37) * _K1) & _M
        y = (_rot((y + v1 + _f64(s, i + 48)) & _M, 42) * _K1) & _M
        x ^= w1
        y = (y + v0 + _f64(s, i + 40)) & _M
        z = (_rot((z + w0) & _M, 33) * _K1) & _M
        v0, v1 = _weak(s, i, (v1 * _K1) & _M, (x + w0) & _M)
        w0, w1 = _weak(s, i + 32, (z + w1) & _M, (y + _f64(s, i + 16)) & _M)
        z, x = x, z
        i += 64
        if i == end:
            break
    mul = (_K1 + ((z & 0xFF) << 1)) & _M
    i = last64
    w0 = (w0 + ((n - 1) & 63)) & _M
    v0 = (v0 + w0) & _M
    w0 = (w0 + v0) & _M
    x = (_rot((x + y + v0 + _f64(s, i + 8)) & _M, 37) * mul) & _M
    y = (_rot((y + v1 + _f64(s, i + 48)) & _M, 42) * mul) & _M
    x ^= (w1 * 9) & _M
    y = (y + v0 * 9 + _f64(s, i + 40)) & _M
    z = (_rot((z + w0) & _M, 33) * mul) & _M
    v0, v1 = _weak(s, i, (v1 * mul) & _M, (x + w0) & _M)
    w0, w1 = _weak(s, i + 32, (z + w1) & _M, (y + _f64(s, i + 16)) & _M)
    z, x = x, z
    return _h16((_h16(v0, w0, mul) + _smix(y) * _K0 + z) & _M,
                (_h16(v1, w1, mul) + x) & _M, mul)


@functools.lru_cache(maxsize=1 << 20)
def _hash_str(s: str, algorithm: str = "farmhash") -> int:
    data = s.encode("utf-8")
    if algorithm == "farmhash":
        return farmhash64(data)
    return fnv1a_64(data)


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


def hash_array(arr, num_buckets: int, mask_zero: bool = False,
               vocabulary_path=None, algorithm: str = "farmhash",
               default_value: int = 0) -> np.ndarray:
    """Vectorized host-side equivalent of the reference ``Hash`` layer call.

    ``algorithm="farmhash"`` (default) assigns the SAME buckets as TF's
    tf.strings.to_hash_bucket_fast; ``"fnv"`` keeps the legacy FNV-1a
    assignment. ``default_value`` is the id for keys missing from
    ``vocabulary_path`` (reference layers/utils.py Hash ``default_value``)."""
    arr = np.asarray(arr)
    str_arr = _stringify(arr)

    # hash/lookup only the unique values, then scatter back
    uniq, inv = np.unique(str_arr, return_inverse=True)

    if vocabulary_path:
        table = load_vocabulary(vocabulary_path)
        uniq_ids = np.array([table.get(u, default_value) for u in uniq],
                            dtype=np.int64)
        return uniq_ids[inv].reshape(arr.shape).astype(np.int32)

    buckets = num_buckets - 1 if mask_zero else num_buckets
    uniq_ids = None
    if len(uniq) > 256:
        # native vectorized hashing (bit-identical); None if lib unavailable
        from . import native

        native_out = native.hash_strings(list(uniq), buckets, mask_zero=False,
                                         algorithm=algorithm)
        if native_out is not None:
            uniq_ids = native_out.astype(np.int64)
    if uniq_ids is None:
        uniq_ids = np.array(
            [_hash_str(u, algorithm) % buckets for u in uniq], dtype=np.int64)
    out = uniq_ids[inv].reshape(arr.shape)
    if mask_zero:
        zero_repr = _stringify(np.zeros([1], dtype=arr.dtype if arr.dtype.kind in "iuf" else np.int32))[0]
        not_zero = (str_arr != zero_repr).astype(np.int64)
        out = (out + 1) * not_zero
    return out.astype(np.int32)
