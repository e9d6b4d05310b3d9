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


class TestTFRecordWriter:
    """write_tfrecord_examples produces spec-correct files: our reader,
    the C++ frame scanner, and TensorFlow's own parser all read them."""

    def _write(self, path):
        from deepctr_tpu.estimator.tfrecord import write_tfrecord_examples

        rows = [
            {"c1": 3, "c2": [1, 2, 7], "d1": 0.5, "label": 1.0},
            {"c1": 0, "c2": [4, 5, 6], "d1": -2.25, "label": 0.0},
            {"c1": 2 ** 40, "c2": [0, 0, 1], "d1": 3.0, "label": 1.0},
        ]
        n = write_tfrecord_examples(str(path), rows)
        assert n == 3
        return rows

    def test_roundtrip_own_reader(self, tmp_path):
        from deepctr_tpu.estimator import FixedLenFeature
        from deepctr_tpu.estimator.tfrecord import read_tfrecord_examples

        path = tmp_path / "t.tfrecords"
        rows = self._write(path)
        spec = {
            "c1": FixedLenFeature([1], "int64"),
            "c2": FixedLenFeature([3], "int64"),
            "d1": FixedLenFeature([1], "float32"),
            "label": FixedLenFeature([1], "float32"),
        }
        out = read_tfrecord_examples(str(path), spec)
        np.testing.assert_array_equal(
            out["c1"].reshape(-1), [r["c1"] for r in rows])
        np.testing.assert_array_equal(
            out["c2"], [r["c2"] for r in rows])
        np.testing.assert_allclose(
            out["d1"].reshape(-1), [r["d1"] for r in rows], rtol=1e-6)

    def test_tensorflow_reads_our_files(self, tmp_path):
        tf = pytest.importorskip("tensorflow")

        path = tmp_path / "t.tfrecords"
        rows = self._write(path)
        spec = {
            "c1": tf.io.FixedLenFeature([1], tf.int64),
            "c2": tf.io.FixedLenFeature([3], tf.int64),
            "d1": tf.io.FixedLenFeature([1], tf.float32),
            "label": tf.io.FixedLenFeature([1], tf.float32),
        }
        ds = tf.data.TFRecordDataset(str(path))  # verifies masked CRCs
        got = [tf.io.parse_single_example(raw, spec) for raw in ds]
        assert len(got) == 3
        for r, g in zip(rows, got):
            assert int(g["c1"].numpy()[0]) == r["c1"]
            np.testing.assert_array_equal(g["c2"].numpy(), r["c2"])
            np.testing.assert_allclose(g["d1"].numpy()[0], r["d1"],
                                       rtol=1e-6)

    def test_native_scanner_reads_our_files(self, tmp_path):
        from deepctr_tpu import native
        from deepctr_tpu.estimator.tfrecord import iter_tfrecord_payloads

        path = tmp_path / "t.tfrecords"
        self._write(path)
        payloads = list(iter_tfrecord_payloads(str(path)))
        assert len(payloads) == 3
        scanned = native.scan_tfrecord(str(path))
        if scanned is not None:
            raw, offsets, lengths = scanned
            assert len(offsets) == 3


def test_masked_crc32c_native_matches_python():
    from deepctr_tpu import native
    from deepctr_tpu.estimator.tfrecord import _crc32c

    def py_masked(data):
        crc = _crc32c(data)
        return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(0)
    for n in (0, 1, 7, 64, 1000, 65537):
        data = rng.randint(0, 256, n, dtype=np.uint8).tobytes()
        assert native.masked_crc32c(data) == py_masked(data)


class TestTFRecordWriterEdgeCases:
    def test_kinds_override_pins_float_encoding(self, tmp_path):
        """Integer-valued floats must not flip to int64 between records."""
        from deepctr_tpu.estimator import FixedLenFeature
        from deepctr_tpu.estimator.tfrecord import (read_tfrecord_examples,
                                                    write_tfrecord_examples)

        path = str(tmp_path / "k.tfrecords")
        rows = [{"price": [0, 1]}, {"price": [0.5, 2.0]}]
        write_tfrecord_examples(path, rows, kinds={"price": "float"})
        out = read_tfrecord_examples(
            path, {"price": FixedLenFeature([2], "float32")})
        np.testing.assert_allclose(out["price"], [[0, 1], [0.5, 2.0]])

    def test_string_features_roundtrip(self, tmp_path):
        from deepctr_tpu.estimator import FixedLenFeature
        from deepctr_tpu.estimator.tfrecord import (read_tfrecord_examples,
                                                    write_tfrecord_examples)

        path = str(tmp_path / "s.tfrecords")
        write_tfrecord_examples(path, [{"id": ["abc"]}, {"id": [b"xy"]}])
        out = read_tfrecord_examples(
            path, {"id": FixedLenFeature([1], "string")})
        assert out["id"].reshape(-1).tolist() == [b"abc", b"xy"]

    def test_truncated_trailing_crc_raises(self, tmp_path):
        from deepctr_tpu.estimator.tfrecord import (iter_tfrecord_payloads,
                                                    write_tfrecord_examples)

        path = str(tmp_path / "t.tfrecords")
        write_tfrecord_examples(path, [{"a": [1]}])
        data = open(path, "rb").read()
        open(path, "wb").write(data[:-2])  # cut into the payload CRC
        with pytest.raises(ValueError):
            list(iter_tfrecord_payloads(path))

    def test_split_list_field_occurrences_merge(self):
        """Parsers must concatenate repeated submessage occurrences."""
        from deepctr_tpu.estimator.tfrecord import (_encode_feature,
                                                    _parse_feature)

        a = _encode_feature([1.5], kind="float")
        b = _encode_feature([2.5, 3.5], kind="float")
        # both are Feature{float_list=...}; concatenating them yields a
        # Feature with TWO field-2 occurrences (protobuf merge semantics)
        merged = a + b
        kind, values = _parse_feature(merged)
        assert kind == "float"
        np.testing.assert_allclose(values, [1.5, 2.5, 3.5])
