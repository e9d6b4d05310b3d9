"""ctypes loader for the native host-ops library (src/hostops.cc).

The library is built on demand with g++ (no pybind11 — plain C ABI).
Everything here degrades gracefully: if the toolchain or build is
unavailable, callers fall back to the pure-Python implementations
(deepctr_tpu/hashing.py, estimator/tfrecord.py), which are bit-identical.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "hostops.cc")
_LIB = os.path.join(_HERE, "libhostops.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.fnv1a64_bucket.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.fnv1a64_bucket.restype = None
        lib.farmhash64_bucket.argtypes = lib.fnv1a64_bucket.argtypes
        lib.farmhash64_bucket.restype = None
        lib.tfrecord_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.tfrecord_scan.restype = ctypes.c_int64
        lib.parse_examples.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.parse_examples.restype = ctypes.c_int64
        try:
            lib.parse_examples_mt.argtypes = (
                lib.parse_examples.argtypes + [ctypes.c_int64])
            lib.parse_examples_mt.restype = ctypes.c_int64
        except AttributeError:  # stale .so without the mt entry point
            pass
        try:
            # strided variants: parse straight into dtype-grouped matrix
            # rows (shuffle pool); + the one-call pool pop
            lib.parse_examples_strided_mt.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64,
            ]
            lib.parse_examples_strided_mt.restype = ctypes.c_int64
            lib.pool_pop.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.pool_pop.restype = None
        except AttributeError:  # stale .so without the pool entry points
            pass
        lib.crc32c_masked.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.crc32c_masked.restype = ctypes.c_uint32
        _lib = lib
        return _lib


def hash_strings(strings, num_buckets: int, mask_zero: bool = False,
                 algorithm: str = "farmhash"):
    """Vectorized bucket hashing of a 1-D sequence of strings.

    ``algorithm="farmhash"`` is bit-identical to TF Fingerprint64 /
    to_hash_bucket_fast; ``"fnv"`` is the legacy FNV-1a assignment.
    Returns int32 buckets, or None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    encoded = [s.encode("utf-8") for s in strings]
    n = len(encoded)
    offsets = np.zeros(n + 1, np.int64)
    for i, b in enumerate(encoded):
        offsets[i + 1] = offsets[i] + len(b)
    blob = b"".join(encoded)
    data = np.frombuffer(blob, np.uint8) if blob else np.zeros(0, np.uint8)
    out = np.empty(n, np.int32)
    fn = lib.farmhash64_bucket if algorithm == "farmhash" else lib.fnv1a64_bucket
    fn(
        data.ctypes.data if n else 0, offsets.ctypes.data, n, num_buckets,
        1 if mask_zero else 0, out.ctypes.data,
    )
    return out


def parse_examples_batch(data: np.ndarray, offsets: np.ndarray,
                         lengths: np.ndarray, schema, nthreads=None):
    """Batch-decode tf.train.Example payloads into dense columns.

    ``data`` is the raw file bytes (uint8 array, possibly a mmap view),
    ``offsets``/``lengths`` address each record's payload, and ``schema``
    is a list of ``(name, kind, width)`` with kind ``"int64"``/``"float"``.

    Returns ``(columns, missing)`` where columns maps name -> (n, width)
    array and missing is an (n, nf) uint8 mask of absent features — or
    None when the native library is unavailable (caller falls back to the
    pure-Python parser). Raises ValueError on malformed records.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(offsets)
    nf = len(schema)
    name_blob = b"".join(name.encode("utf-8") for name, _, _ in schema)
    name_off = np.zeros(nf + 1, np.int64)
    for j, (name, _, _) in enumerate(schema):
        name_off[j + 1] = name_off[j] + len(name.encode("utf-8"))
    names = (np.frombuffer(name_blob, np.uint8)
             if name_blob else np.zeros(0, np.uint8))
    kinds = np.asarray([1 if k == "float" else 0 for _, k, _ in schema],
                       np.int32)
    widths = np.asarray([w for _, _, w in schema], np.int64)
    cols = {}
    ptrs = (ctypes.c_void_p * nf)()
    for j, (name, kind, width) in enumerate(schema):
        dtype = np.float32 if kind == "float" else np.int64
        arr = np.zeros((n, width), dtype)
        cols[name] = arr
        ptrs[j] = arr.ctypes.data
    missing = np.zeros((n, nf), np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    mt = getattr(lib, "parse_examples_mt", None)
    if nthreads is None:
        nthreads = min(8, os.cpu_count() or 1)
    if mt is not None and n >= 2048 and nthreads > 1:
        # rows are independent; threads write disjoint row ranges
        # (bit-identical to the single-thread path)
        rc = mt(
            data.ctypes.data, offsets.ctypes.data, lengths.ctypes.data, n,
            names.ctypes.data if nf else 0, name_off.ctypes.data,
            kinds.ctypes.data, widths.ctypes.data, nf,
            ctypes.cast(ptrs, ctypes.c_void_p), missing.ctypes.data,
            nthreads,
        )
    else:
        rc = lib.parse_examples(
            data.ctypes.data, offsets.ctypes.data, lengths.ctypes.data, n,
            names.ctypes.data if nf else 0, name_off.ctypes.data,
            kinds.ctypes.data, widths.ctypes.data, nf,
            ctypes.cast(ptrs, ctypes.c_void_p), missing.ctypes.data,
        )
    if rc < 0:
        raise ValueError("Malformed tf.train.Example at record %d" % (-rc - 1))
    return cols, missing


def parse_examples_into(data: np.ndarray, offsets: np.ndarray,
                        lengths: np.ndarray, schema, dest_ptrs,
                        dest_strides, nthreads=None):
    """Decode Example payloads DIRECTLY into caller buffers (e.g. rows of
    the shuffle pool's dtype-grouped matrices): ``dest_ptrs[j]`` addresses
    feature j's first element, ``dest_strides[j]`` its row stride in
    ELEMENTS. Returns the (n, nf) missing mask, or None when the strided
    native entry point is unavailable. Raises ValueError on malformed
    records."""
    lib = get_lib()
    if lib is None or getattr(lib, "parse_examples_strided_mt", None) is None:
        return None
    n = len(offsets)
    nf = len(schema)
    name_blob = b"".join(name.encode("utf-8") for name, _, _ in schema)
    name_off = np.zeros(nf + 1, np.int64)
    for j, (name, _, _) in enumerate(schema):
        name_off[j + 1] = name_off[j] + len(name.encode("utf-8"))
    names = (np.frombuffer(name_blob, np.uint8)
             if name_blob else np.zeros(0, np.uint8))
    kinds = np.asarray([1 if k == "float" else 0 for _, k, _ in schema],
                       np.int32)
    widths = np.asarray([w for _, _, w in schema], np.int64)
    strides = np.ascontiguousarray(dest_strides, np.int64)
    ptrs = (ctypes.c_void_p * nf)(*[int(p) for p in dest_ptrs])
    missing = np.zeros((n, nf), np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    if nthreads is None:
        nthreads = min(8, os.cpu_count() or 1)
    rc = lib.parse_examples_strided_mt(
        data.ctypes.data, offsets.ctypes.data, lengths.ctypes.data, n,
        names.ctypes.data if nf else 0, name_off.ctypes.data,
        kinds.ctypes.data, widths.ctypes.data, strides.ctypes.data, nf,
        ctypes.cast(ptrs, ctypes.c_void_p), missing.ctypes.data,
        nthreads if n >= 2048 else 1,
    )
    if rc < 0:
        raise ValueError("Malformed tf.train.Example at record %d" % (-rc - 1))
    return missing


def pool_pop_native(mats, row_bytes, size, count, seed, scratch, outs):
    """One-call shuffle-pool pop (sample + gather + compact; GIL
    released). Returns False when the native entry point is unavailable —
    the caller falls back to the numpy pop."""
    lib = get_lib()
    if lib is None or getattr(lib, "pool_pop", None) is None:
        return False
    g = len(mats)
    mat_ptrs = (ctypes.c_void_p * g)(*[m.ctypes.data for m in mats])
    out_ptrs = (ctypes.c_void_p * g)(*[o.ctypes.data for o in outs])
    rb = np.ascontiguousarray(row_bytes, np.int64)
    lib.pool_pop(
        ctypes.cast(mat_ptrs, ctypes.c_void_p), rb.ctypes.data, g,
        int(size), int(count), ctypes.c_uint64(int(seed) & (2 ** 64 - 1)),
        scratch.ctypes.data, ctypes.cast(out_ptrs, ctypes.c_void_p),
    )
    return True


def scan_tfrecord_data(data: np.ndarray):
    """(offsets, lengths) of every record payload in a raw TFRecord byte
    array (uint8; may be an mmap view — streaming readers pass one so file
    pages stay evictable), or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    size = len(data)
    cap = max(16, size // 12)
    off = np.empty(cap, np.int64)
    length = np.empty(cap, np.int64)
    n = lib.tfrecord_scan(data.ctypes.data, size, off.ctypes.data,
                          length.ctypes.data, cap)
    if n < 0:
        raise ValueError("Malformed TFRecord data")
    if n > cap:  # extremely small records; rescan with exact capacity
        off = np.empty(n, np.int64)
        length = np.empty(n, np.int64)
        lib.tfrecord_scan(data.ctypes.data, size, off.ctypes.data,
                          length.ctypes.data, n)
    return off[:n], length[:n]


def scan_tfrecord(path: str):
    """(raw, offsets, lengths) of every record payload in a TFRecord file,
    or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        raw = f.read()
    data = np.frombuffer(raw, np.uint8)
    try:
        scanned = scan_tfrecord_data(data)
    except ValueError:
        raise ValueError("Malformed TFRecord file: %s" % path)
    if scanned is None:
        return None
    off, length = scanned
    return raw, off, length


def masked_crc32c(data: bytes):
    """TFRecord masked crc32c of ``data``, or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    return int(lib.crc32c_masked(
        buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(len(buf))))
