"""Generate >=1M-row held-out-eval datasets as TFRecords (VERDICT r3 #5).

Two real-schema datasets with PLANTED ground truth (so held-out AUC is a
meaningful, learnable target rather than coin-flip noise), written with
the framework's own TFRecord writer so BOTH frameworks read the exact
same bytes:

- tabular/ (criteo schema): 26 sparse x vocab 2000 + 13 dense. Logit =
  per-id effects + linear dense + 5 planted pairwise interactions
  (dot of per-id latent vectors) — the structure DeepFM's FM term models.
- seq/ (DIN schema): item vocab 5000, 20-step histories; logit =
  scaled dot(mean(history item latents), target item latent) — the
  structure attention/pooling models learn.

Labels ~ Bernoulli(sigmoid(logit)). 1M train / 100k held-out each.
Run: PYTHONPATH=/root/repo python tools/gen_heldout_data.py [outdir]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from deepctr_tpu.estimator.tfrecord import write_tfrecord_examples  # noqa: E402

N_TRAIN = 1_000_000
N_TEST = 100_000
SPARSE_VOCAB = 2000
N_SPARSE = 26
N_DENSE = 13
ITEM_VOCAB = 5000
HIST_T = 20


def gen_tabular(outdir, rng):
    w = rng.normal(0, 0.35, (N_SPARSE, SPARSE_VOCAB)).astype(np.float32)
    beta = rng.normal(0, 0.5, N_DENSE).astype(np.float32)
    pairs = [(0, 1), (2, 5), (7, 11), (13, 20), (21, 25)]
    v = rng.normal(0, 0.55, (N_SPARSE, SPARSE_VOCAB, 4)).astype(np.float32)
    b0 = -0.9  # ~30% positives

    os.makedirs(outdir, exist_ok=True)

    def rows(n, seed):
        r = np.random.RandomState(seed)
        chunk = 100_000
        done = 0
        while done < n:
            m = min(chunk, n - done)
            ids = r.randint(0, SPARSE_VOCAB, (m, N_SPARSE)).astype(np.int64)
            dense = r.rand(m, N_DENSE).astype(np.float32)
            logit = w[np.arange(N_SPARSE)[None, :], ids].sum(1)
            logit += dense @ beta + b0
            for fi, fj in pairs:
                logit += np.einsum("bk,bk->b", v[fi, ids[:, fi]],
                                   v[fj, ids[:, fj]])
            p = 1.0 / (1.0 + np.exp(-logit))
            y = (r.rand(m) < p).astype(np.float32)
            for i in range(m):
                yield ({**{"C%d" % (f + 1): int(ids[i, f])
                           for f in range(N_SPARSE)},
                        **{"I%d" % (f + 1): float(dense[i, f])
                           for f in range(N_DENSE)},
                        "label": float(y[i])})
            done += m
            print("  tabular %d/%d" % (done, n), flush=True)

    for name, n, seed in (("train", N_TRAIN, 1), ("test", N_TEST, 2)):
        path = os.path.join(outdir, name + ".tfrecords")
        write_tfrecord_examples(path, rows(n, seed))
        print("wrote %s" % path, flush=True)
    meta = {"n_sparse": N_SPARSE, "vocab": SPARSE_VOCAB, "n_dense": N_DENSE,
            "n_train": N_TRAIN, "n_test": N_TEST}
    json.dump(meta, open(os.path.join(outdir, "meta.json"), "w"))


def gen_seq(outdir, rng):
    vec = rng.normal(0, 1.0, (ITEM_VOCAB, 8)).astype(np.float32)
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    # per-item popularity main effect: without it the signal is PURE
    # matrix factorization, which CTR models (tiny 1e-4 embedding init,
    # BCE) cannot escape in a couple of epochs — both frameworks sat at
    # AUC 0.50. Real CTR data always has popularity structure.
    pop = rng.normal(0, 0.8, ITEM_VOCAB).astype(np.float32)
    alpha = 6.0
    os.makedirs(outdir, exist_ok=True)

    def rows(n, seed):
        r = np.random.RandomState(seed)
        chunk = 100_000
        done = 0
        while done < n:
            m = min(chunk, n - done)
            # ids are 1-based; 0 is padding (mask_zero semantics)
            hist = r.randint(1, ITEM_VOCAB, (m, HIST_T)).astype(np.int64)
            hlen = r.randint(5, HIST_T + 1, m)
            pad = np.arange(HIST_T)[None, :] >= hlen[:, None]
            hist[pad] = 0
            target = r.randint(1, ITEM_VOCAB, m).astype(np.int64)
            interest = np.where(pad[..., None], 0.0, vec[hist]).sum(1)
            interest /= hlen[:, None]
            logit = (alpha * np.einsum("bk,bk->b", interest, vec[target])
                     + pop[target] - 0.35)
            p = 1.0 / (1.0 + np.exp(-logit))
            y = (r.rand(m) < p).astype(np.float32)
            for i in range(m):
                yield ({"item": int(target[i]),
                        "hist_item": [int(t) for t in hist[i]],
                        "seq_length": int(hlen[i]),
                        "label": float(y[i])})
            done += m
            print("  seq %d/%d" % (done, n), flush=True)

    for name, n, seed in (("train", N_TRAIN, 3), ("test", N_TEST, 4)):
        path = os.path.join(outdir, name + ".tfrecords")
        write_tfrecord_examples(path, rows(n, seed))
        print("wrote %s" % path, flush=True)
    meta = {"item_vocab": ITEM_VOCAB, "hist_t": HIST_T,
            "n_train": N_TRAIN, "n_test": N_TEST}
    json.dump(meta, open(os.path.join(outdir, "meta.json"), "w"))


# census-like multitask schema (reference examples/run_mtl.py trains MMOE
# on census-income: categorical demographics + continuous features, two
# binary tasks). Two tasks share latent structure (shared per-id factors)
# but weight it differently + have task-specific main effects — exactly
# what shared-expert/gate architectures model.
MT_N_SPARSE = 8
MT_VOCAB = 1000
MT_N_DENSE = 5


def gen_multitask(outdir, rng):
    z = rng.normal(0, 0.5, (MT_N_SPARSE, MT_VOCAB, 4)).astype(np.float32)
    # task-specific readouts of the shared factors
    u1 = rng.normal(0, 0.7, (MT_N_SPARSE, 4)).astype(np.float32)
    u2 = rng.normal(0, 0.7, (MT_N_SPARSE, 4)).astype(np.float32)
    w1 = rng.normal(0, 0.3, (MT_N_SPARSE, MT_VOCAB)).astype(np.float32)
    w2 = rng.normal(0, 0.3, (MT_N_SPARSE, MT_VOCAB)).astype(np.float32)
    b1d = rng.normal(0, 0.5, MT_N_DENSE).astype(np.float32)
    b2d = rng.normal(0, 0.5, MT_N_DENSE).astype(np.float32)

    os.makedirs(outdir, exist_ok=True)

    def rows(n, seed):
        r = np.random.RandomState(seed)
        chunk = 100_000
        done = 0
        while done < n:
            m = min(chunk, n - done)
            ids = r.randint(0, MT_VOCAB, (m, MT_N_SPARSE)).astype(np.int64)
            dense = r.rand(m, MT_N_DENSE).astype(np.float32)
            zi = z[np.arange(MT_N_SPARSE)[None, :], ids]  # (m, F, 4)
            l1 = (np.einsum("mfk,fk->m", zi, u1)
                  + w1[np.arange(MT_N_SPARSE)[None, :], ids].sum(1)
                  + dense @ b1d - 0.8)
            l2 = (np.einsum("mfk,fk->m", zi, u2)
                  + w2[np.arange(MT_N_SPARSE)[None, :], ids].sum(1)
                  + dense @ b2d - 1.2)
            y1 = (r.rand(m) < 1 / (1 + np.exp(-l1))).astype(np.float32)
            y2 = (r.rand(m) < 1 / (1 + np.exp(-l2))).astype(np.float32)
            for i in range(m):
                yield ({**{"C%d" % (f + 1): int(ids[i, f])
                           for f in range(MT_N_SPARSE)},
                        **{"I%d" % (f + 1): float(dense[i, f])
                           for f in range(MT_N_DENSE)},
                        "label1": float(y1[i]), "label2": float(y2[i])})
            done += m
            print("  multitask %d/%d" % (done, n), flush=True)

    for name, n, seed in (("train", N_TRAIN, 5), ("test", N_TEST, 6)):
        path = os.path.join(outdir, name + ".tfrecords")
        write_tfrecord_examples(path, rows(n, seed))
        print("wrote %s" % path, flush=True)
    meta = {"n_sparse": MT_N_SPARSE, "vocab": MT_VOCAB,
            "n_dense": MT_N_DENSE, "n_train": N_TRAIN, "n_test": N_TEST}
    json.dump(meta, open(os.path.join(outdir, "meta.json"), "w"))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/heldout_data"
    only = sys.argv[2] if len(sys.argv) > 2 else None
    rng = np.random.RandomState(0)
    if only in (None, "tabular"):
        gen_tabular(os.path.join(out, "tabular"), rng)
    if only in (None, "seq"):
        gen_seq(os.path.join(out, "seq"), rng)
    if only in (None, "multitask"):
        # own seed: reproducible whether or not the other generators ran
        gen_multitask(os.path.join(out, "multitask"),
                      np.random.RandomState(1234))
    print("done")
