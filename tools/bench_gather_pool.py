"""Fused Pallas gather+pool vs the plain-XLA path, on real TPU.

VERDICT item 6's done criterion: a recorded TPU bench for
``ops/embedding.fused_gather_pool`` vs ``reference_gather_pool`` (gather
then masked reduce) at the real CTR embedding dims — E=16 (criteo/DIN
shape, exercises the small-E lane packing) and E=128 (native line width).

Measures forward and forward+backward (grad wrt the table, the training
pattern) at a DIN-like shape: one varlen feature, (B, T) ids into a
(V, E) table, ~70% valid mask.

    PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
        python tools/bench_gather_pool.py [--batch 4096] [--maxlen 50]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_one(B, T, V, E, combiner, reps, rounds, interpret=False):
    import jax
    import jax.numpy as jnp

    from deepctr_tpu.ops.embedding import (fused_gather_pool,
                                           reference_gather_pool)

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.standard_normal((V, E)), jnp.float32)
    ids = jnp.asarray(rng.randint(0, V, (B, T)).astype(np.int32))
    lens = rng.randint(1, T + 1, (B,))
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None])
                       .astype(np.float32))

    fused_f = jax.jit(
        lambda t: fused_gather_pool(t, ids, mask, combiner, interpret))
    ref_f = jax.jit(lambda t: reference_gather_pool(t, ids, mask, combiner))
    fused_g = jax.jit(jax.grad(
        lambda t: fused_gather_pool(t, ids, mask, combiner, interpret).sum()))
    ref_g = jax.jit(jax.grad(
        lambda t: reference_gather_pool(t, ids, mask, combiner).sum()))

    # parity check rides along (clip/mask semantics must match)
    a, b = fused_f(table), ref_f(table)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)
    fns = {"fused_fwd": lambda: fused_f(table),
           "xla_fwd": lambda: ref_f(table),
           "fused_grad": lambda: fused_g(table),
           "xla_grad": lambda: ref_g(table)}
    for f in fns.values():
        out = f()
        jax.block_until_ready(out)
    _ = float(jnp.asarray(out).reshape(-1)[0])  # honest mode: force D2H

    res = {n: [] for n in fns}
    for _r in range(rounds):
        for n, f in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = f()
            jax.block_until_ready(out)
            _ = float(jnp.asarray(out).reshape(-1)[0])
            res[n].append((time.perf_counter() - t0) / reps * 1e3)

    line = {"B": B, "T": T, "V": V, "E": E, "combiner": combiner}
    for n, v in res.items():
        line[n + "_ms"] = round(float(np.median(v)), 3)
    line["fwd_speedup"] = round(line["xla_fwd_ms"] / line["fused_fwd_ms"], 2)
    line["grad_speedup"] = round(line["xla_grad_ms"] / line["fused_grad_ms"], 2)
    print(json.dumps(line), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--maxlen", type=int, default=50)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--combiner", default="sum")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--dims", type=int, nargs="+", default=[16, 128])
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode kernel (CPU smoke run)")
    args = ap.parse_args()
    for E in args.dims:
        bench_one(args.batch, args.maxlen, args.vocab, E, args.combiner,
                  args.reps, args.rounds, args.interpret)


if __name__ == "__main__":
    main()
