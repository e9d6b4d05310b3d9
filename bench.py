"""Benchmark: DeepFM training throughput (examples/s) on one chip.

Criteo-shaped synthetic workload: 26 sparse features (100k vocab, dim 16) +
13 dense — the layout of the reference's run_classification_criteo.py —
batch 32768 (typical accelerator CTR batch; MLPerf DLRM uses 32k-64k global).
Optimizer: adam on the dense tower + row-wise adagrad on embedding tables
(the recommended TPU configuration, training/optimizers.py).

Prints ONE JSON line. ``vs_baseline`` is examples/s relative to the recorded
reference-framework figure when available — the reference publishes none
(BASELINE.md), so null means 'no recorded baseline; self-measured'.
"""
from __future__ import annotations

import json
import time

import numpy as np

BATCH = 32768
STEPS = 50


def main():
    import jax
    import jax.numpy as jnp

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu.training.optimizers import embedding_split_optimizer

    cols = [SparseFeat("C%d" % i, 100_000, 16) for i in range(26)]
    cols += [DenseFeat("I%d" % i, 1) for i in range(13)]

    rng = np.random.RandomState(0)
    x = {}
    for fc in cols:
        if isinstance(fc, SparseFeat):
            x[fc.name] = rng.randint(0, fc.vocabulary_size, (BATCH, 1)).astype(np.int32)
        else:
            x[fc.name] = rng.rand(BATCH, 1).astype(np.float32)
    y = rng.randint(0, 2, BATCH).astype(np.float32)[:, None]
    w = np.ones(BATCH, np.float32)

    model = DeepFM(cols, cols, dnn_hidden_units=(256, 128, 64))
    # bf16 table storage halves embedding HBM traffic (~8% step speedup,
    # quality-neutral on the sample datasets — tests/bf16_embedding_test.py)
    model.compile(embedding_split_optimizer(), "binary_crossentropy",
                  embedding_dtype="bfloat16")
    xc = canonicalize_batch(x, model.feature_columns)
    model._ensure_built(xc)
    train_step = model._build_train_step()

    xb = {k: jnp.asarray(v) for k, v in xc.items()}
    yb, wb = jnp.asarray(y), jnp.asarray(w)
    key = jax.random.PRNGKey(0)

    # warmup / compile
    state = model.state
    state, loss, _ = train_step(state, xb, yb, wb, key)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, loss, _ = train_step(state, xb, yb, wb, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    examples_per_s = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "deepfm_criteo_train_examples_per_s_per_chip",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
