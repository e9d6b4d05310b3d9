"""Dense-vs-sparse crossover sweep: where the sparse engine starts to win.

For each vocab size, builds DeepFM twice (dense adam vs the sparse
embedding engine) and times full train steps INTERLEAVED in one process
(chained, repeated rounds) so service-window variance affects both paths
equally (CLAUDE.md measurement discipline). Prints one JSON line per
vocab with both ms/step figures and the ratio.

    python bench_crossover.py [--batch 4096] [--vocabs 100000,1000000,4000000]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build(mode, cols, batches):
    import jax.numpy as jnp

    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import DeepFM

    model = DeepFM(cols, cols, dnn_hidden_units=(256, 128, 64))
    if mode == "dense":
        model.compile("adam", "binary_crossentropy")
    else:
        model.compile("adam", "binary_crossentropy",
                      sparse_embedding_updates=True)
    xcs = [canonicalize_batch(x, model.feature_columns) for x in batches]
    model._ensure_built(xcs[0])
    step = model._build_train_step()
    xbs = [{k: jnp.asarray(v) for k, v in xc.items()} for xc in xcs]
    return model, step, xbs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--vocabs", default="100000,1000000,4000000")
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepctr_tpu import DenseFeat, SparseFeat

    B = args.batch
    for V in [int(v) for v in args.vocabs.split(",")]:
        cols = [SparseFeat("C%d" % i, V, 16) for i in range(args.tables)]
        cols += [DenseFeat("I%d" % i, 1) for i in range(13)]
        rng = np.random.RandomState(0)
        batches = []
        for s in range(8):
            x = {}
            for fc in cols:
                if isinstance(fc, SparseFeat):
                    x[fc.name] = rng.randint(0, V, (B, 1)).astype(np.int32)
                else:
                    x[fc.name] = rng.rand(B, 1).astype(np.float32)
            batches.append(x)
        y = rng.randint(0, 2, B).astype(np.float32)[:, None]
        yb = jnp.asarray(y)
        wb = jnp.asarray(np.ones(B, np.float32))
        key = jax.random.PRNGKey(0)

        runs = {}
        try:
            dm, dstep, dxbs = build("dense", cols, batches)
        except Exception as e:  # dense optimizer state may not fit HBM
            dm = None
            runs["dense_ms"] = None
            print(json.dumps({"note": "dense build failed at V=%d: %s"
                              % (V, type(e).__name__)}))
        sm, sstep, sxbs = build("sparse", cols, batches)

        states = {}
        if dm is not None:
            try:  # allocation is lazy — OOM surfaces at the warmup step
                states["dense"] = dm.state
                st, l, _ = dstep(states["dense"], dxbs[0], yb, wb, key)
                jax.block_until_ready(l)
                states["dense"] = st
            except Exception as e:
                dm = None
                states.pop("dense", None)
                print(json.dumps({"note": "dense step failed at V=%d: %s"
                                  % (V, type(e).__name__)}), flush=True)
        states["sparse"] = sm.state
        st, l, _ = sstep(states["sparse"], sxbs[0], yb, wb, key)
        jax.block_until_ready(l)
        states["sparse"] = st
        _ = float(l)  # force honest sync mode (axon pre-D2H timings lie)

        def run(step, name, xbs):
            st = states[name]
            t0 = time.perf_counter()
            for i in range(args.steps):
                st, l, _ = step(st, xbs[i % 8], yb, wb, key)
            jax.block_until_ready(l)
            states[name] = st
            return (time.perf_counter() - t0) / args.steps * 1e3

        d_ms, s_ms = [], []
        for r in range(args.rounds):
            if dm is not None:
                d_ms.append(run(dstep, "dense", dxbs))
            s_ms.append(run(sstep, "sparse", sxbs))
        out = {
            "metric": "dense_vs_sparse_crossover",
            "vocab": V, "tables": args.tables, "batch": B,
            "dense_ms": round(float(np.median(d_ms)), 3) if d_ms else None,
            "sparse_ms": round(float(np.median(s_ms)), 3),
        }
        if d_ms:
            out["sparse_speedup"] = round(out["dense_ms"] / out["sparse_ms"], 3)
        print(json.dumps(out), flush=True)
        # free HBM before the next vocab size
        del states, dm, sm, dstep, sstep, dxbs, sxbs
        jax.clear_caches()


if __name__ == "__main__":
    main()
