"""Huge-vocab demo: the sparse embedding engine's reason to exist.

8 tables x 10M rows x dim 16 = 1.28B embedding params (5.1 GB f32).
- dense path + adam: params 5.1 GB + moments 10.2 GB + dense grads 5.1 GB
  -> exceeds one chip's 16 GB HBM (expected to OOM).
- sparse engine: params 5.1 GB + row-wise accumulators 0.32 GB + O(batch)
  row traffic -> trains on one chip.

Prints one JSON line per attempted configuration.
"""
from __future__ import annotations

import json
import time

import numpy as np

N_TABLES, VOCAB, DIM = 8, 10_000_000, 16
BATCH = 4096


def _data(rng):
    from deepctr_tpu import DenseFeat, SparseFeat

    cols = [SparseFeat("C%d" % i, VOCAB, DIM) for i in range(N_TABLES)]
    cols += [DenseFeat("I0", 1)]
    x = {fc.name: rng.randint(0, VOCAB, (BATCH, 1)).astype(np.int32)
         for fc in cols[:-1]}
    x["I0"] = rng.rand(BATCH, 1).astype(np.float32)
    y = rng.randint(0, 2, BATCH).astype(np.float32)[:, None]
    return cols, x, y


def run(mode):
    import jax
    import jax.numpy as jnp

    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import DeepFM

    rng = np.random.RandomState(0)
    cols, x, y = _data(rng)
    w = np.ones(BATCH, np.float32)
    model = DeepFM(cols, cols, dnn_hidden_units=(64, 32))
    if mode == "dense_adam":
        model.compile("adam", "binary_crossentropy")
    else:
        model.compile("adam", "binary_crossentropy",
                      sparse_embedding_updates=True)
    xc = canonicalize_batch(x, model.feature_columns)
    try:
        model._ensure_built(xc)
        step = model._build_train_step()
        xb = {k: jnp.asarray(v) for k, v in xc.items()}
        yb, wb = jnp.asarray(y), jnp.asarray(w)
        key = jax.random.PRNGKey(0)
        state = model.state
        state, loss, _ = step(state, xb, yb, wb, key)
        jax.block_until_ready(loss)
        # Force the client into synchronous (honest) mode: on the axon backend,
        # block_until_ready does NOT actually wait until the process has done
        # one device->host read — pre-read timings are dispatch-only fantasy
        # (measured "82 PFLOP/s"; see CLAUDE.md round-2 notes).
        _ = float(jnp.asarray(loss).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(10):
            state, loss, _ = step(state, xb, yb, wb, key)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / 10
        print(json.dumps({
            "metric": "large_vocab_train", "mode": mode,
            "embedding_params": N_TABLES * VOCAB * DIM,
            "value": round(BATCH / dt, 1), "unit": "examples/s",
            "status": "ok", "loss": float(loss),
        }))
    except Exception as e:  # noqa: BLE001 - report OOM etc.
        print(json.dumps({
            "metric": "large_vocab_train", "mode": mode,
            "embedding_params": N_TABLES * VOCAB * DIM,
            "status": "failed", "error": type(e).__name__,
            "detail": str(e)[:160],
        }))


if __name__ == "__main__":
    import sys

    run(sys.argv[1] if len(sys.argv) > 1 else "sparse")
