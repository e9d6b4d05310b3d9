"""Fresh-process bench: full DeepFM train step, dense vs sparse engine.

Criteo-shaped workload (26 sparse x 100k vocab x dim 16 + 13 dense,
DNN 256-128-64). One mode per process (CLAUDE.md measurement discipline):

    python bench_engine.py --mode {dense-adam,dense-split,sparse,sparse-pallas} \
        [--batch 4096] [--steps 50] [--bf16]

Rotating id batches (8 pre-generated) so the sparse paths see fresh ids
each step, chained state, block_until_ready at the end.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu.training.optimizers import embedding_split_optimizer

    B = args.batch
    cols = [SparseFeat("C%d" % i, 100_000, 16) for i in range(26)]
    cols += [DenseFeat("I%d" % i, 1) for i in range(13)]

    rng = np.random.RandomState(0)
    batches = []
    for s in range(8):
        x = {}
        for fc in cols:
            if isinstance(fc, SparseFeat):
                x[fc.name] = rng.randint(0, fc.vocabulary_size, (B, 1)).astype(np.int32)
            else:
                x[fc.name] = rng.rand(B, 1).astype(np.float32)
        batches.append(x)
    y = rng.randint(0, 2, B).astype(np.float32)[:, None]
    w = np.ones(B, np.float32)

    model = DeepFM(cols, cols, dnn_hidden_units=(256, 128, 64))
    kw = dict(embedding_dtype="bfloat16") if args.bf16 else {}
    if args.mode == "dense-adam":
        model.compile("adam", "binary_crossentropy", **kw)
    elif args.mode == "dense-split":
        model.compile(embedding_split_optimizer(), "binary_crossentropy", **kw)
    elif args.mode in ("sparse", "sparse-pallas"):
        model.compile("adam", "binary_crossentropy",
                      sparse_embedding_updates=True,
                      pallas_scatter_updates=args.mode == "sparse-pallas", **kw)
    else:
        raise SystemExit("unknown mode " + args.mode)

    xcs = [canonicalize_batch(x, model.feature_columns) for x in batches]
    model._ensure_built(xcs[0])
    train_step = model._build_train_step()
    xbs = [{k: jnp.asarray(v) for k, v in xc.items()} for xc in xcs]
    yb, wb = jnp.asarray(y), jnp.asarray(w)
    key = jax.random.PRNGKey(0)

    state = model.state
    state, loss, _ = train_step(state, xbs[0], yb, wb, key)
    jax.block_until_ready(loss)
    # Force the client into synchronous (honest) mode: on the axon backend,
    # block_until_ready does NOT actually wait until the process has done
    # one device->host read — pre-read timings are dispatch-only fantasy
    # (measured "82 PFLOP/s"; see CLAUDE.md round-2 notes).
    _ = float(jnp.asarray(loss).reshape(-1)[0])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, loss, _ = train_step(state, xbs[i % 8], yb, wb, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    examples_per_s = B * args.steps / dt
    print(json.dumps({
        "metric": "deepfm_%s_b%d_examples_per_s" % (args.mode, B),
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "ms_per_step": round(dt / args.steps * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
