"""Reconciliation bench: same process, same window — how do the pieces of
the criteo train step cost against bare primitives?

Times, interleaved over several rounds so service-window drift affects
every row equally:

  stream    : sequential 256 MB elementwise pass (GB/s reference)
  gather    : jnp.take of 26*B random E=16 bf16 rows from a stacked table
  scatter   : .at[ids].add of the same rows (XLA scatter-add)
  train     : one full DeepFM train step (b=B, embedding_split, bf16)

If 'train' is much cheaper than gather+scatter, XLA's autodiff scatter
inside the step takes a different (faster) path than the bare scatter op;
if not, the step is gather/scatter-bound as modeled.

    python tools/bench_reconcile.py [--batch 32768] [--rounds 3]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu.training.optimizers import embedding_split_optimizer

    rng = np.random.RandomState(0)
    V, E, T = 26 * 100_000, 16, 26

    # --- bare primitives on a stacked (2.6M, 16) bf16 table
    table = jnp.asarray(rng.standard_normal((V, E)), jnp.bfloat16)
    ids = jnp.asarray(rng.randint(0, V, (T * B,)).astype(np.int32))
    rows = jnp.asarray(rng.standard_normal((T * B, E)), jnp.bfloat16)

    gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0).astype(jnp.float32).sum())
    scatter = jax.jit(lambda t, i, r: t.at[i].add(r))

    buf = jnp.zeros((64 * 1024 * 1024,), jnp.float32)
    stream = jax.jit(lambda b: b * 1.0000001 + 1e-12)

    # --- full train step
    cols = [SparseFeat("C%d" % i, 100_000, 16) for i in range(26)]
    cols += [DenseFeat("I%d" % i, 1) for i in range(13)]
    x = {}
    for fc in cols:
        if isinstance(fc, SparseFeat):
            x[fc.name] = rng.randint(0, fc.vocabulary_size, (B, 1)).astype(np.int32)
        else:
            x[fc.name] = rng.rand(B, 1).astype(np.float32)
    y = rng.randint(0, 2, B).astype(np.float32)[:, None]
    w = np.ones(B, np.float32)
    model = DeepFM(cols, cols, dnn_hidden_units=(256, 128, 64))
    model.compile(embedding_split_optimizer(), "binary_crossentropy",
                  embedding_dtype="bfloat16")
    xc = canonicalize_batch(x, model.feature_columns)
    model._ensure_built(xc)
    step = model._build_train_step()
    xb = {k: jnp.asarray(v) for k, v in xc.items()}
    yb, wb = jnp.asarray(y), jnp.asarray(w)
    key = jax.random.PRNGKey(0)
    state = model.state

    # warmup everything, then force honest mode
    s = gather(table, ids); jax.block_until_ready(s)
    t2 = scatter(table, ids, rows); jax.block_until_ready(t2); del t2
    b2 = stream(buf); jax.block_until_ready(b2); del b2
    state, loss, _ = step(state, xb, yb, wb, key)
    _ = float(jnp.asarray(loss).reshape(-1)[0])
    _ = float(s)

    def timeit(fn):
        t0 = time.perf_counter()
        out = None
        for _i in range(args.reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps * 1e3  # ms

    results = {k: [] for k in ("stream_ms", "gather_ms", "scatter_ms", "train_ms")}
    st = {"state": state}

    def train_once():
        st["state"], l, _ = step(st["state"], xb, yb, wb, key)
        return l

    for _r in range(args.rounds):
        results["stream_ms"].append(timeit(lambda: stream(buf)))
        results["gather_ms"].append(timeit(lambda: gather(table, ids)))
        results["scatter_ms"].append(timeit(lambda: scatter(table, ids, rows)))
        results["train_ms"].append(timeit(train_once))

    out = {"batch": B, "rows_per_op": T * B}
    for k, v in results.items():
        out[k] = round(float(np.median(v)), 3)
    out["stream_gbps"] = round(2 * buf.nbytes / (out["stream_ms"] / 1e3) / 1e9, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
