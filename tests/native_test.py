"""Native host-ops tests: C++ paths must be bit-identical to Python."""
from __future__ import annotations

import numpy as np
import pytest

from deepctr_tpu import native
from deepctr_tpu.hashing import fnv1a_64, hash_array

TFRECORD = "/root/reference/examples/criteo_sample.te.tfrecords"


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_hash_matches_python(lib):
    strings = ["lake", "merson", "0", "", "a" * 100, "日本語"]
    out = native.hash_strings(strings, 97, mask_zero=False, algorithm="fnv")
    want = [fnv1a_64(s.encode("utf-8")) % 97 for s in strings]
    np.testing.assert_array_equal(out, want)


def test_native_hash_mask_zero(lib):
    out = native.hash_strings(["0", "x"], 10, mask_zero=True)
    assert out[0] == 0 and 1 <= out[1] < 10


def test_hash_array_uses_native_for_large_inputs(lib):
    # >256 unique values triggers the native path; results must be
    # identical to the small-input (pure-Python) path
    values = np.array(["v%d" % i for i in range(1000)])
    large = hash_array(values, 50)
    small = np.concatenate([hash_array(values[i:i + 100], 50) for i in range(0, 1000, 100)])
    np.testing.assert_array_equal(large, small)


@pytest.mark.skipif(not __import__("os").path.exists(TFRECORD),
                    reason="reference sample data not available")
def test_native_tfrecord_scan_matches_python(lib):
    import deepctr_tpu.estimator.tfrecord as tfr

    raw, offsets, lengths = native.scan_tfrecord(TFRECORD)
    native_payloads = [raw[o:o + l] for o, l in zip(offsets, lengths)]

    # pure-Python framing
    py_payloads = []
    import struct

    with open(TFRECORD, "rb") as f:
        while True:
            header = f.read(12)
            if not header:
                break
            (length,) = struct.unpack("<Q", header[:8])
            py_payloads.append(f.read(length))
            f.read(4)
    assert len(native_payloads) == len(py_payloads) > 0
    for a, b in zip(native_payloads, py_payloads):
        assert a == b
