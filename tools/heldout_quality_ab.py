"""Held-out AUC parity at real scale (VERDICT r3 #5): train DeepFM and
DIN on the 1M-row generated datasets (tools/gen_heldout_data.py), eval on
the 100k held-out split, OURS vs the REFERENCE DeepCTR (TF CPU) on the
IDENTICAL TFRecord bytes. Done-gate: |AUC_ours - AUC_ref| <= 0.002.

One side per process (fresh-process discipline):

  # ours (TPU by default; JAX_PLATFORMS=cpu works too)
  PYTHONPATH=/root/repo[:/root/.axon_site] python tools/heldout_quality_ab.py ours deepfm
  # reference
  TF_USE_LEGACY_KERAS=1 PYTHONPATH=/root/repo:/root/reference \
      python tools/heldout_quality_ab.py ref deepfm

Prints ONE JSON line: {"side","model","auc","logloss","train_s"}.
Hyperparams are identical on both sides: adam(0.001), bce, batch 4096,
2 epochs, embedding_dim 16 (deepfm) / 8 (din), same column schemas.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATA = os.environ.get("HELDOUT_DATA", "/root/repo/heldout_data")
BATCH = 4096
EPOCHS = int(os.environ.get("HELDOUT_EPOCHS", "2"))

SPARSE = ["C%d" % i for i in range(1, 27)]
DENSE = ["I%d" % i for i in range(1, 14)]
VOCAB = 2000
ITEM_VOCAB = 5000
HIST_T = 20


def _auc(y, p):
    from sklearn.metrics import log_loss, roc_auc_score

    y = np.asarray(y).reshape(-1)
    p = np.asarray(p).reshape(-1)
    return roc_auc_score(y, p), log_loss(y, np.clip(p, 1e-7, 1 - 1e-7))


# ---------------------------------------------------------------- ours --
def ours_deepfm():
    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.estimator.inputs import (FixedLenFeature,
                                              input_fn_tfrecord)
    from deepctr_tpu.models import DeepFM

    desc = {f: FixedLenFeature((1,), "int64", 0) for f in SPARSE}
    desc.update({f: FixedLenFeature((1,), "float32", 0.0) for f in DENSE})
    desc["label"] = FixedLenFeature((1,), "float32")
    d = os.path.join(DATA, "tabular")
    train_fn = input_fn_tfrecord(
        os.path.join(d, "train.tfrecords"), desc, label="label",
        batch_size=BATCH, num_epochs=EPOCHS, shuffle_factor=10)
    test_fn = input_fn_tfrecord(
        os.path.join(d, "test.tfrecords"), desc, label="label",
        batch_size=BATCH, num_epochs=1, shuffle_factor=0)

    cols = ([SparseFeat(f, VOCAB, 16) for f in SPARSE] +
            [DenseFeat(f, 1) for f in DENSE])
    model = DeepFM(cols, cols)
    model.compile("adam", "binary_crossentropy")
    t0 = time.time()
    model.fit(train_fn, verbose=0, steps_per_execution=8)
    train_s = time.time() - t0
    ys, ps = _ours_predict(model, test_fn)
    return ys, ps, train_s


def _ours_predict(model, test_fn):
    ys, ps = [], []
    for xb, yb in test_fn():
        ps.append(np.asarray(model.predict(xb, batch_size=len(yb))))
        ys.append(np.asarray(yb).reshape(-1))
    return np.concatenate(ys), np.concatenate(ps).reshape(-1)


def ours_din():
    from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat
    from deepctr_tpu.estimator.inputs import (FixedLenFeature,
                                              input_fn_tfrecord)
    from deepctr_tpu.models import DIN

    desc = {"item": FixedLenFeature((1,), "int64", 0),
            "hist_item": FixedLenFeature((HIST_T,), "int64", 0),
            "seq_length": FixedLenFeature((1,), "int64", 0),
            "label": FixedLenFeature((1,), "float32")}
    d = os.path.join(DATA, "seq")
    train_fn = input_fn_tfrecord(
        os.path.join(d, "train.tfrecords"), desc, label="label",
        batch_size=BATCH, num_epochs=EPOCHS, shuffle_factor=10)
    test_fn = input_fn_tfrecord(
        os.path.join(d, "test.tfrecords"), desc, label="label",
        batch_size=BATCH, num_epochs=1, shuffle_factor=0)

    cols = [
        SparseFeat("item", ITEM_VOCAB, 8),
        VarLenSparseFeat(
            SparseFeat("hist_item", ITEM_VOCAB, 8, embedding_name="item"),
            maxlen=HIST_T, length_name="seq_length"),
    ]
    model = DIN(cols, ["item"], dnn_hidden_units=(64, 32))
    model.compile("adam", "binary_crossentropy")
    t0 = time.time()
    model.fit(train_fn, verbose=0, steps_per_execution=8)
    train_s = time.time() - t0
    ys, ps = _ours_predict(model, test_fn)
    return ys, ps, train_s


def _ours_tabular(model_cls, **kw):
    """Shared tabular-side driver: AutoInt / xDeepFM ride the SAME data
    and schema as deepfm. compile() uses DEFAULTS on purpose — round 4
    made auto mixed precision the default for attention/CIN models, and
    this harness is the held-out-quality evidence for that default
    (VERDICT r4 weak #4)."""
    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.estimator.inputs import (FixedLenFeature,
                                              input_fn_tfrecord)

    desc = {f: FixedLenFeature((1,), "int64", 0) for f in SPARSE}
    desc.update({f: FixedLenFeature((1,), "float32", 0.0) for f in DENSE})
    desc["label"] = FixedLenFeature((1,), "float32")
    d = os.path.join(DATA, "tabular")
    train_fn = input_fn_tfrecord(
        os.path.join(d, "train.tfrecords"), desc, label="label",
        batch_size=BATCH, num_epochs=EPOCHS, shuffle_factor=10)
    test_fn = input_fn_tfrecord(
        os.path.join(d, "test.tfrecords"), desc, label="label",
        batch_size=BATCH, num_epochs=1, shuffle_factor=0)
    cols = ([SparseFeat(f, VOCAB, 16) for f in SPARSE] +
            [DenseFeat(f, 1) for f in DENSE])
    model = model_cls(cols, **kw)
    # HELDOUT_F32=1 forces f32 activations (isolates whether an AUC delta
    # comes from the auto-bf16 default or from model/run variance)
    ckw = (dict(compute_dtype="float32")
           if os.environ.get("HELDOUT_F32") == "1" else {})
    model.compile("adam", "binary_crossentropy", **ckw)
    t0 = time.time()
    model.fit(train_fn, verbose=0, steps_per_execution=8)
    train_s = time.time() - t0
    ys, ps = _ours_predict(model, test_fn)
    return ys, ps, train_s


def ours_autoint():
    from deepctr_tpu.models import AutoInt

    def make(cols):
        return AutoInt(cols, cols)

    return _ours_tabular(make)


def ours_xdeepfm():
    from deepctr_tpu.models import xDeepFM

    def make(cols):
        return xDeepFM(cols, cols)

    return _ours_tabular(make)


MT_SPARSE = ["C%d" % i for i in range(1, 9)]
MT_DENSE = ["I%d" % i for i in range(1, 6)]
MT_VOCAB = 1000


def _mt_desc():
    from deepctr_tpu.estimator.inputs import FixedLenFeature

    desc = {f: FixedLenFeature((1,), "int64", 0) for f in MT_SPARSE}
    desc.update({f: FixedLenFeature((1,), "float32", 0.0)
                 for f in MT_DENSE})
    desc["label1"] = FixedLenFeature((1,), "float32")
    desc["label2"] = FixedLenFeature((1,), "float32")
    return desc


def ours_mmoe():
    import numpy as _np

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.estimator.inputs import input_fn_tfrecord
    from deepctr_tpu.models import MMOE

    d = os.path.join(DATA, "multitask")
    desc = _mt_desc()
    train_fn = input_fn_tfrecord(
        os.path.join(d, "train.tfrecords"), desc,
        label=["label1", "label2"], batch_size=BATCH,
        num_epochs=EPOCHS, shuffle_factor=10)
    test_fn = input_fn_tfrecord(
        os.path.join(d, "test.tfrecords"), desc,
        label=["label1", "label2"], batch_size=BATCH, num_epochs=1,
        shuffle_factor=0)
    cols = ([SparseFeat(f, MT_VOCAB, 16) for f in MT_SPARSE] +
            [DenseFeat(f, 1) for f in MT_DENSE])
    model = MMOE(cols, task_types=("binary", "binary"),
                 task_names=("t1", "t2"))
    model.compile("adam", ["binary_crossentropy", "binary_crossentropy"])
    t0 = time.time()
    model.fit(train_fn, verbose=0, steps_per_execution=8)
    train_s = time.time() - t0
    ys, ps = [], []
    for xb, yb in test_fn():
        ps.append(_np.asarray(model.predict(xb, batch_size=len(yb))))
        ys.append(_np.asarray(yb))
    return (_np.concatenate(ys).reshape(-1, 2),
            _np.concatenate(ps).reshape(-1, 2), train_s)


# ----------------------------------------------------------------- ref --
def _tf_dataset(path, seq, shuffle):
    import tensorflow as tf

    if seq:
        desc = {"item": tf.io.FixedLenFeature([1], tf.int64),
                "hist_item": tf.io.FixedLenFeature([HIST_T], tf.int64),
                "seq_length": tf.io.FixedLenFeature([1], tf.int64),
                "label": tf.io.FixedLenFeature([1], tf.float32)}
    else:
        desc = {f: tf.io.FixedLenFeature([1], tf.int64) for f in SPARSE}
        desc.update({f: tf.io.FixedLenFeature([1], tf.float32)
                     for f in DENSE})
        desc["label"] = tf.io.FixedLenFeature([1], tf.float32)

    def parse(ex):
        feats = tf.io.parse_single_example(ex, desc)
        label = feats.pop("label")
        return feats, label

    ds = tf.data.TFRecordDataset(path).map(
        parse, num_parallel_calls=tf.data.AUTOTUNE)
    if shuffle:
        ds = ds.shuffle(10 * BATCH, seed=7)
    return ds.batch(BATCH).prefetch(tf.data.AUTOTUNE)


def ref_deepfm():
    from deepctr.feature_column import DenseFeat, SparseFeat
    from deepctr.models import DeepFM

    d = os.path.join(DATA, "tabular")
    cols = ([SparseFeat(f, VOCAB, 16) for f in SPARSE] +
            [DenseFeat(f, 1) for f in DENSE])
    model = DeepFM(cols, cols)
    model.compile("adam", "binary_crossentropy")
    tr = _tf_dataset(os.path.join(d, "train.tfrecords"), False, True)
    te = _tf_dataset(os.path.join(d, "test.tfrecords"), False, False)
    t0 = time.time()
    model.fit(tr, epochs=EPOCHS, verbose=0)
    train_s = time.time() - t0
    ys = np.concatenate([y.numpy().reshape(-1) for _, y in te])
    ps = model.predict(te, verbose=0).reshape(-1)
    return ys, ps, train_s


def ref_din():
    from deepctr.feature_column import SparseFeat, VarLenSparseFeat
    from deepctr.models import DIN

    d = os.path.join(DATA, "seq")
    cols = [
        SparseFeat("item", ITEM_VOCAB, 8),
        VarLenSparseFeat(
            SparseFeat("hist_item", ITEM_VOCAB, 8, embedding_name="item"),
            maxlen=HIST_T, length_name="seq_length"),
    ]
    model = DIN(cols, ["item"], dnn_hidden_units=(64, 32))
    model.compile("adam", "binary_crossentropy")
    tr = _tf_dataset(os.path.join(d, "train.tfrecords"), True, True)
    te = _tf_dataset(os.path.join(d, "test.tfrecords"), True, False)
    t0 = time.time()
    model.fit(tr, epochs=EPOCHS, verbose=0)
    train_s = time.time() - t0
    ys = np.concatenate([y.numpy().reshape(-1) for _, y in te])
    ps = model.predict(te, verbose=0).reshape(-1)
    return ys, ps, train_s


def _ref_tabular(model_cls):
    from deepctr.feature_column import DenseFeat, SparseFeat

    d = os.path.join(DATA, "tabular")
    cols = ([SparseFeat(f, VOCAB, 16) for f in SPARSE] +
            [DenseFeat(f, 1) for f in DENSE])
    model = model_cls(cols)
    model.compile("adam", "binary_crossentropy")
    tr = _tf_dataset(os.path.join(d, "train.tfrecords"), False, True)
    te = _tf_dataset(os.path.join(d, "test.tfrecords"), False, False)
    t0 = time.time()
    model.fit(tr, epochs=EPOCHS, verbose=0)
    train_s = time.time() - t0
    ys = np.concatenate([y.numpy().reshape(-1) for _, y in te])
    ps = model.predict(te, verbose=0).reshape(-1)
    return ys, ps, train_s


def ref_autoint():
    from deepctr.models import AutoInt

    return _ref_tabular(lambda cols: AutoInt(cols, cols))


def ref_xdeepfm():
    from deepctr.models import xDeepFM

    return _ref_tabular(lambda cols: xDeepFM(cols, cols))


def _tf_dataset_mt(path, shuffle):
    import tensorflow as tf

    desc = {f: tf.io.FixedLenFeature([1], tf.int64) for f in MT_SPARSE}
    desc.update({f: tf.io.FixedLenFeature([1], tf.float32)
                 for f in MT_DENSE})
    desc["label1"] = tf.io.FixedLenFeature([1], tf.float32)
    desc["label2"] = tf.io.FixedLenFeature([1], tf.float32)

    def parse(ex):
        feats = tf.io.parse_single_example(ex, desc)
        y1 = feats.pop("label1")
        y2 = feats.pop("label2")
        return feats, (y1, y2)

    ds = tf.data.TFRecordDataset(path).map(
        parse, num_parallel_calls=tf.data.AUTOTUNE)
    if shuffle:
        ds = ds.shuffle(10 * BATCH, seed=7)
    return ds.batch(BATCH).prefetch(tf.data.AUTOTUNE)


def ref_mmoe():
    from deepctr.feature_column import DenseFeat, SparseFeat
    from deepctr.models import MMOE

    d = os.path.join(DATA, "multitask")
    cols = ([SparseFeat(f, MT_VOCAB, 16) for f in MT_SPARSE] +
            [DenseFeat(f, 1) for f in MT_DENSE])
    model = MMOE(cols, task_types=("binary", "binary"),
                 task_names=("t1", "t2"))
    model.compile("adam", ["binary_crossentropy", "binary_crossentropy"])
    tr = _tf_dataset_mt(os.path.join(d, "train.tfrecords"), True)
    te = _tf_dataset_mt(os.path.join(d, "test.tfrecords"), False)
    t0 = time.time()
    model.fit(tr, epochs=EPOCHS, verbose=0)
    train_s = time.time() - t0
    ys = np.concatenate(
        [np.stack([y1.numpy().reshape(-1), y2.numpy().reshape(-1)], 1)
         for _, (y1, y2) in te])
    ps = model.predict(te, verbose=0)
    ps = np.stack([np.asarray(p).reshape(-1) for p in ps], axis=1)
    return ys, ps, train_s


def main():
    side, model = sys.argv[1], sys.argv[2]
    fn = {("ours", "deepfm"): ours_deepfm, ("ours", "din"): ours_din,
          ("ours", "autoint"): ours_autoint,
          ("ours", "xdeepfm"): ours_xdeepfm,
          ("ours", "mmoe"): ours_mmoe,
          ("ref", "deepfm"): ref_deepfm, ("ref", "din"): ref_din,
          ("ref", "autoint"): ref_autoint,
          ("ref", "xdeepfm"): ref_xdeepfm,
          ("ref", "mmoe"): ref_mmoe}[(side, model)]
    ys, ps, train_s = fn()
    if np.asarray(ys).ndim == 2:  # multitask: per-task AUC/logloss
        aucs, lls = [], []
        for k in range(np.asarray(ys).shape[1]):
            a, l = _auc(ys[:, k], ps[:, k])
            aucs.append(round(a, 4))
            lls.append(round(l, 4))
        print(json.dumps({"side": side, "model": model, "auc": aucs,
                          "logloss": lls, "n_test": int(len(ys)),
                          "train_s": round(train_s, 1)}), flush=True)
        return
    auc, ll = _auc(ys, ps)
    print(json.dumps({"side": side, "model": model, "auc": round(auc, 4),
                      "logloss": round(ll, 4), "n_test": int(len(ys)),
                      "train_s": round(train_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
