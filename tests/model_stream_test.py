"""Model-tier streaming fit/evaluate/predict (VERDICT r2 Missing #1).

``CTRModel.fit`` accepting an input_fn / generator, backed by the
constant-memory TFRecord pipeline (estimator/streaming.py), composing with
``steps_per_execution`` — the Keras ``fit(generator)`` contract the
reference inherits from tf.keras (reference deepctr/estimator/inputs.py:22-52
for the input_fn side).
"""
from __future__ import annotations

import os

import numpy as np
import pytest

from deepctr_tpu import DenseFeat, SparseFeat
from deepctr_tpu.estimator.inputs import FixedLenFeature, input_fn_tfrecord
from deepctr_tpu.models import DeepFM
from deepctr_tpu.training import data as data_lib

TR = "/root/reference/examples/criteo_sample.tr.tfrecords"
needs_sample = pytest.mark.skipif(not os.path.exists(TR),
                                  reason="reference sample data not present")

SPARSE = ["C" + str(i) for i in range(1, 27)]
DENSE = ["I" + str(i) for i in range(1, 14)]


def _criteo_desc():
    desc = {f: FixedLenFeature((1,), "float32", 0.0) for f in DENSE}
    desc.update({f: FixedLenFeature((1,), "int64", 0) for f in SPARSE})
    desc["label"] = FixedLenFeature((1,), "float32")
    return desc


def _criteo_cols():
    return ([SparseFeat(f, 1000, 4) for f in SPARSE] +
            [DenseFeat(f, 1) for f in DENSE])


def _small_model(seed=1024):
    cols = _criteo_cols()
    model = DeepFM(cols, cols, dnn_hidden_units=(16,), seed=seed)
    model.compile("adam", "binary_crossentropy")
    return model


def _hash_ids(x):
    """sparse ids mod vocab so random tfrecord ids stay in range."""
    out = dict(x)
    for f in SPARSE:
        out[f] = np.asarray(out[f]) % 1000
    return out


def _stream_fn(batch_size=64, num_epochs=1, shuffle_factor=0):
    base = input_fn_tfrecord(TR, _criteo_desc(), label="label",
                             batch_size=batch_size, num_epochs=num_epochs,
                             shuffle_factor=shuffle_factor)

    def fn():
        for x, y in base():
            yield _hash_ids(x), y

    return fn


@needs_sample
def test_fit_from_tfrecord_input_fn():
    model = _small_model()
    hist = model.fit(_stream_fn(num_epochs=1), epochs=2, verbose=0)
    assert len(hist.epoch) == 2
    assert all(np.isfinite(v) for v in hist.history["loss"])
    # evaluate from a stream too
    logs = model.evaluate(_stream_fn(num_epochs=1))
    assert np.isfinite(logs["loss"])
    preds = model.predict(_stream_fn(num_epochs=1))
    assert preds.shape[1] == 1 and np.isfinite(preds).all()


@needs_sample
def test_fit_stream_matches_in_memory_fit():
    """A generator replaying iterate_batches' exact batches must produce
    bit-identical training to fit(x, y, shuffle=False)."""
    from deepctr_tpu.estimator.tfrecord import read_tfrecord_examples
    import jax

    raw = read_tfrecord_examples(TR, _criteo_desc())
    y = np.asarray(raw.pop("label"), np.float32).reshape(-1)
    x = _hash_ids(raw)

    m1 = _small_model(seed=7)
    m1.fit(x, y, batch_size=64, epochs=1, shuffle=False, verbose=0)

    def gen():
        n = len(y)
        for s in range(0, n, 64):
            yield ({k: v[s:s + 64] for k, v in x.items()}, y[s:s + 64])

    m2 = _small_model(seed=7)
    m2.fit(gen(), epochs=1, verbose=0)

    l1 = jax.tree_util.tree_leaves(m1.state.params)
    l2 = jax.tree_util.tree_leaves(m2.state.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


@needs_sample
def test_fit_stream_composes_with_steps_per_execution():
    m1 = _small_model(seed=3)
    m1.fit(_stream_fn(num_epochs=2), epochs=1, verbose=0)
    m2 = _small_model(seed=3)
    m2.fit(_stream_fn(num_epochs=2), epochs=1, verbose=0,
           steps_per_execution=3)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(m1.state.params),
                    jax.tree_util.tree_leaves(m2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


@needs_sample
def test_fit_stream_steps_per_epoch_bounds_repeating_stream():
    model = _small_model()
    # num_epochs=None repeats forever; steps_per_epoch must bound it
    hist = model.fit(_stream_fn(num_epochs=None), epochs=2,
                     steps_per_epoch=3, verbose=0)
    assert len(hist.epoch) == 2


def test_fit_steps_per_epoch_bounds_in_memory_fit():
    rng = np.random.RandomState(0)
    cols = [SparseFeat("s", 10, 4), DenseFeat("d", 1)]
    x = {"s": rng.randint(0, 10, (100, 1)), "d": rng.rand(100, 1)}
    y = rng.randint(0, 2, 100).astype(np.float32)
    model = DeepFM(cols, cols, dnn_hidden_units=(8,))
    model.compile("adam")
    hist = model.fit(x, y, batch_size=10, epochs=1, steps_per_epoch=4,
                     verbose=0)
    assert len(hist.epoch) == 1


@needs_sample
def test_fit_stream_rejects_y_and_validation_split():
    model = _small_model()
    with pytest.raises(ValueError, match="stream"):
        model.fit(_stream_fn(), y=np.zeros(4), verbose=0)
    with pytest.raises(ValueError, match="validation_split"):
        model.fit(_stream_fn(), validation_split=0.2, verbose=0)


def test_plain_iterator_exhaustion_stops_epochs():
    rng = np.random.RandomState(0)
    cols = [SparseFeat("s", 10, 4), DenseFeat("d", 1)]

    def batches(n):
        for _ in range(n):
            yield ({"s": rng.randint(0, 10, (16, 1)),
                    "d": rng.rand(16, 1)},
                   rng.randint(0, 2, 16).astype(np.float32))

    model = DeepFM(cols, cols, dnn_hidden_units=(8,))
    model.compile("adam")
    # 5 batches, plain iterator: epoch 1 consumes all, epochs 2-3 see none
    hist = model.fit(batches(5), epochs=3, verbose=0)
    assert len(hist.epoch) == 1


@needs_sample
def test_model_tier_streaming_fit_is_constant_memory():
    """Flat-RSS acceptance test (VERDICT r2 item 2): train DeepFM from
    .tfrecords at the model tier over many epochs; peak RSS stays flat."""
    import resource

    model = _small_model()
    model.fit(_stream_fn(num_epochs=2), epochs=1, verbose=0)  # warmup
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    model.fit(_stream_fn(num_epochs=10), epochs=1, verbose=0)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert rss1 - rss0 < 32 * 1024, (rss0, rss1)


def test_is_stream_classifier():
    assert data_lib.is_stream(lambda: iter(()))
    assert data_lib.is_stream(iter([]))
    assert data_lib.is_stream((i for i in range(3)))
    assert not data_lib.is_stream({"a": np.zeros(3)})
    assert not data_lib.is_stream(np.zeros(3))
    assert not data_lib.is_stream([np.zeros(3)])


@needs_sample
def test_validation_data_stream():
    """Keras generator contract: validation_data may be an input_fn
    (re-invoked per epoch) or a finite iterator (replayed per epoch)."""
    model = _small_model()
    hist = model.fit(_stream_fn(num_epochs=1), epochs=2, verbose=0,
                     validation_data=_stream_fn(num_epochs=1))
    assert all(np.isfinite(v) for v in hist.history["val_loss"])
    assert len(hist.history["val_loss"]) == 2

    model2 = _small_model()
    hist2 = model2.fit(_stream_fn(num_epochs=1), epochs=2, verbose=0,
                       validation_data=_stream_fn(num_epochs=1)())
    assert len(hist2.history["val_loss"]) == 2


def test_class_weight_matches_equivalent_sample_weight():
    rng = np.random.RandomState(0)
    cols = [SparseFeat("s", 10, 4), DenseFeat("d", 1)]
    x = {"s": rng.randint(0, 10, (64, 1)), "d": rng.rand(64, 1)}
    y = rng.randint(0, 2, 64).astype(np.float32)
    import jax

    m1 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=5)
    m1.compile("adam")
    m1.fit(x, y, batch_size=16, epochs=1, shuffle=False, verbose=0,
           class_weight={0: 1.0, 1: 3.0})
    m2 = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=5)
    m2.compile("adam")
    m2.fit(x, y, batch_size=16, epochs=1, shuffle=False, verbose=0,
           sample_weight=np.where(y > 0.5, 3.0, 1.0).astype(np.float32))
    for a, b in zip(jax.tree_util.tree_leaves(m1.state.params),
                    jax.tree_util.tree_leaves(m2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


@needs_sample
def test_validation_steps_bounds_repeating_validation_stream():
    model = _small_model()
    hist = model.fit(_stream_fn(num_epochs=1), epochs=1, verbose=0,
                     validation_data=_stream_fn(num_epochs=None),
                     validation_steps=2)
    assert np.isfinite(hist.history["val_loss"][0])
