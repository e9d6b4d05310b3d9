"""Which scatter formulation does XLA serve fastest on TPU?

Round-2 reconcile finding: a bare ``table.at[ids].add(rows)`` over 852k
random rows costs ~9x the equivalent forward gather (~100 ns/row), yet
the full train step — whose autodiff emits scatter-adds into ZEROED
gradient buffers — is several times cheaper than that one op. This bench
pins down which algebraic shape of the same update is fast:

  direct_add   : table.at[ids].add(rows)              (engine's apply today)
  zeros_add    : table + zeros.at[ids].add(rows)      (scatter-into-zeros + pass)
  vjp_add      : table + grad-of-gather transpose     (exact autodiff pattern)
  direct_set   : table.at[ids].set(rows)              (unique sorted ids)
  zeros_where  : mask-select rebuild via one-hot-free segment trick

ids are sorted-unique for *_set (the engine provides sorted unique rows);
duplicates allowed otherwise.

    python tools/bench_scatter_paths.py [--batch 32768] [--tables 26]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, T, V, E = args.batch, args.tables, args.vocab, args.dim
    N = T * B
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.standard_normal((T * V, E)), jnp.float32)
    ids = jnp.asarray(
        (rng.randint(0, V, (T, B)) + np.arange(T)[:, None] * V)
        .reshape(-1).astype(np.int32))
    uniq = np.unique(np.asarray(ids))
    # pad unique ids to a static shape with id[0] repeats (engine-style)
    uids = jnp.asarray(np.concatenate([uniq, np.full(N - len(uniq), uniq[0],
                                                     np.int32)]).astype(np.int32))
    rows = jnp.asarray(rng.standard_normal((N, E)), jnp.float32)

    @jax.jit
    def direct_add(t, i, r):
        return t.at[i].add(r)

    @jax.jit
    def zeros_add(t, i, r):
        return t + jnp.zeros_like(t).at[i].add(r)

    @jax.jit
    def vjp_add(t, i, r):
        def f(tt):
            return (jnp.take(tt, i, axis=0) * r).sum()

        return t + jax.grad(f)(t)

    @jax.jit
    def direct_set(t, i, r):
        return t.at[i].set(r)

    @jax.jit
    def segsum_zeros_add(t, i, r):
        # engine-style: sort ids, segment-sum duplicates, scatter once
        order = jnp.argsort(i)
        si, sr = i[order], r[order]
        first = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
        seg = jnp.cumsum(first) - 1
        summed = jax.ops.segment_sum(sr, seg, num_segments=N)
        reps = jnp.where(first, si, 0)
        owner = jax.ops.segment_max(si, seg, num_segments=N)
        return t + jnp.zeros_like(t).at[owner].add(summed)

    fns = {
        "direct_add": lambda: direct_add(table, ids, rows),
        "zeros_add": lambda: zeros_add(table, ids, rows),
        "vjp_add": lambda: vjp_add(table, ids, rows),
        "direct_set": lambda: direct_set(table, uids, rows),
        "segsum_zeros_add": lambda: segsum_zeros_add(table, ids, rows),
    }
    for f in fns.values():
        out = f()
        jax.block_until_ready(out)
    _ = float(jnp.asarray(out).reshape(-1)[0])  # honest mode

    results = {n: [] for n in fns}
    for _r in range(args.rounds):
        for n, f in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(args.reps):
                out = f()
            jax.block_until_ready(out)
            _ = float(jnp.asarray(out).reshape(-1)[0])
            results[n].append((time.perf_counter() - t0) / args.reps * 1e3)

    out = {"rows": N, "vocab": V, "tables": T}
    for n, v in results.items():
        ms = float(np.median(v))
        out[n + "_ms"] = round(ms, 3)
        out[n + "_ns_per_row"] = round(ms * 1e6 / N, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
