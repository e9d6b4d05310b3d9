"""Measure the reference DeepCTR (TF) on bench.py's exact workload.

Same synthetic criteo-shaped batch as /root/repo/bench.py: 26 sparse
features (100k vocab, dim 16) + 13 dense, DNN (256,128,64), batch 32768,
adam, binary cross-entropy. Runs the reference framework on this host
(TF CPU — the reference has no TPU path in this image), giving the
like-for-like "reference on available hardware" denominator that bench.py
reports as ``vs_baseline``.

Run:
    TF_USE_LEGACY_KERAS=1 PYTHONPATH=/root/reference python tools/bench_reference_tf.py
"""
from __future__ import annotations

import json
import time

import numpy as np

BATCH = 32768
STEPS = 8  # timed optimizer steps (after 2 warmup steps)


def main():
    from deepctr.feature_column import DenseFeat, SparseFeat, get_feature_names
    from deepctr.models import DeepFM

    cols = [SparseFeat("C%d" % i, 100_000, 16) for i in range(26)]
    cols += [DenseFeat("I%d" % i, 1) for i in range(13)]

    rng = np.random.RandomState(0)
    n = BATCH * 2  # two distinct batches, reused
    x = {}
    for fc in cols:
        if isinstance(fc, SparseFeat):
            x[fc.name] = rng.randint(0, fc.vocabulary_size, (n,)).astype(np.int64)
        else:
            x[fc.name] = rng.rand(n, 1).astype(np.float32)
    y = rng.randint(0, 2, n).astype(np.float32)

    model = DeepFM(cols, cols, dnn_hidden_units=(256, 128, 64))
    model.compile("adam", "binary_crossentropy")
    names = get_feature_names(cols)
    xs = [x[name] for name in names]

    model.fit(xs, y, batch_size=BATCH, epochs=1, verbose=0, shuffle=False)  # warmup
    t0 = time.perf_counter()
    epochs = max(1, STEPS // 2)
    model.fit(xs, y, batch_size=BATCH, epochs=epochs, verbose=0, shuffle=False)
    dt = time.perf_counter() - t0
    steps = epochs * 2
    print(json.dumps({
        "metric": "reference_tf_deepfm_criteo_train_examples_per_s",
        "value": round(BATCH * steps / dt, 1),
        "unit": "examples/s",
        "hardware": "host CPU (reference has no TPU path in this image)",
        "ms_per_step": round(dt / steps * 1e3, 1),
        "batch": BATCH,
        "steps": steps,
    }))


if __name__ == "__main__":
    main()
