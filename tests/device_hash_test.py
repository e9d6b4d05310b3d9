"""In-graph hashing parity: ops/hash.py must assign bit-identical buckets
to the host pipeline (hashing.hash_array) for integer keys — that is what
makes raw-key serving artifacts predict exactly like model.predict on
host-hashed batches (tests/serving_test.py round-trips it end to end)."""
from __future__ import annotations

import jax
import numpy as np
import pytest

from deepctr_tpu import hashing
from deepctr_tpu.ops.hash import device_hash_bucket

# every decimal-length class an int32 can produce, plus sign + boundaries
EDGE_KEYS = np.array(
    [0, 1, 5, 9, 10, 42, 99, 100, 999, 1000, 9999, 10000, 99999, 100000,
     999999, 1000000, 9999999, 10000000, 99999999, 100000000, 999999999,
     1000000000, 2147483647, -1, -9, -10, -99, -12345, -2147483648],
    dtype=np.int32)


@pytest.mark.parametrize("algorithm", ["farmhash", "fnv"])
@pytest.mark.parametrize("mask_zero", [False, True])
def test_bucket_parity_edges(algorithm, mask_zero):
    buckets = 1000
    host = hashing.hash_array(EDGE_KEYS, buckets, mask_zero=mask_zero,
                              algorithm=algorithm)
    dev = np.asarray(device_hash_bucket(EDGE_KEYS, buckets,
                                        mask_zero=mask_zero,
                                        algorithm=algorithm))
    np.testing.assert_array_equal(host, dev)


@pytest.mark.parametrize("algorithm", ["farmhash", "fnv"])
def test_bucket_parity_random(algorithm):
    rng = np.random.RandomState(0)
    for buckets in (7, 999, 100_000, (1 << 24) - 1):
        keys = rng.randint(-(2**31), 2**31, size=2048).astype(np.int32)
        host = hashing.hash_array(keys, buckets, algorithm=algorithm)
        dev = np.asarray(device_hash_bucket(keys, buckets,
                                            algorithm=algorithm))
        np.testing.assert_array_equal(host, dev)


def test_matches_tf_fingerprint_when_available():
    """The farmhash path must equal tf.strings.to_hash_bucket_fast on the
    stringified keys (the reference Hash layer's exact op)."""
    tf = pytest.importorskip("tensorflow")
    keys = np.array([0, 1, 123, 99999, 2147483647, -42], dtype=np.int32)
    want = tf.strings.to_hash_bucket_fast(
        [str(int(k)) for k in keys], 100_000).numpy()
    got = np.asarray(device_hash_bucket(keys, 100_000))
    np.testing.assert_array_equal(want, got.astype(np.int64))


def test_jit_and_2d_shapes():
    keys = np.random.RandomState(1).randint(0, 10**9, (32, 5)).astype(
        np.int32)
    fn = jax.jit(lambda k: device_hash_bucket(k, 5000, mask_zero=True))
    out = np.asarray(fn(keys))
    host = hashing.hash_array(keys, 5000, mask_zero=True)
    np.testing.assert_array_equal(host, out)
    assert out.shape == keys.shape


def test_rejects_bad_inputs():
    with pytest.raises(TypeError):
        device_hash_bucket(np.ones(3, np.float32), 10)
    with pytest.raises(ValueError):
        device_hash_bucket(np.ones(3, np.int32), 1 << 25)


def test_hash_layer_in_graph_matches_host():
    """The Hash LAYER (reference utils.py:41-121 hashes in-graph) routes
    integer jax arrays through the device kernel INSIDE jit — custom
    models calling Hash()(ids) in __call__ now work on device, with the
    exact host-pipeline buckets."""
    import jax.numpy as jnp

    from deepctr_tpu.layers.utils import Hash

    keys = np.array([[0, 1, 123], [99999, 2147483647, -42]], np.int32)
    for mask_zero in (False, True):
        layer = Hash(1000, mask_zero=mask_zero)
        host = layer(keys)  # numpy in -> host path
        dev = np.asarray(jax.jit(lambda k: Hash(1000, mask_zero=mask_zero)(k))(
            jnp.asarray(keys)))
        np.testing.assert_array_equal(host, dev)


@pytest.mark.parametrize("algorithm", ["farmhash", "fnv"])
def test_u64_bucket_parity(algorithm):
    """64-bit keys as [lo, hi] int32 planes: bit-parity with the host
    hashing the int64's decimal string (incl. INT64 extremes and the
    17-20-digit FarmHash tier)."""
    from deepctr_tpu.ops.hash import device_hash_bucket_u64

    rng = np.random.RandomState(0)
    keys = np.concatenate([
        np.array([0, 1, 9, 2**31 - 1, 2**31, 2**32, 10**10, 10**15,
                  10**18, 2**63 - 1, -1, -10**12, -(2**63)], np.int64),
        rng.randint(-(2**63), 2**63 - 1, 2048, dtype=np.int64)])
    lo = (keys & 0xFFFFFFFF).astype(np.uint32).astype(
        np.int64).astype(np.int32)
    hi = ((keys >> 32) & 0xFFFFFFFF).astype(np.uint32).astype(
        np.int64).astype(np.int32)
    for mz in (False, True):
        host = hashing.hash_array(keys, 100_000, mask_zero=mz,
                                  algorithm=algorithm)
        dev = np.asarray(jax.jit(
            lambda l, h: device_hash_bucket_u64(
                l, h, 100_000, mask_zero=mz, algorithm=algorithm))(lo, hi))
        np.testing.assert_array_equal(host, dev)
