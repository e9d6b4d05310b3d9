"""Fresh-process micro-bench: sparse embedding update paths on TPU.

Measures the row-sparse rowwise-adagrad update (sort + dedup + scatter) at
the criteo flagship shape, comparing the XLA scatter path against the
Pallas lane-packed DMA kernel (ops/scatter.py). Run ONE mode per process
(CLAUDE.md measurement discipline: same-op timings swing with process
history):

    python bench_scatter.py --mode {scatter-xla,scatter-pallas,
                                    engine-xla,engine-pallas} \
        [--V 100000] [--E 16] [--N 4096] [--steps 50] [--tables 26]

Chained dependencies (the updated table feeds the next step), >=30 steps,
block_until_ready at the end only.
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True)
    ap.add_argument("--V", type=int, default=100_000)
    ap.add_argument("--E", type=int, default=16)
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--tables", type=int, default=26)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepctr_tpu.ops.scatter import scatter_add_rows
    from deepctr_tpu.training.sparse_embedding import _rowwise_adagrad_scatter

    rng = np.random.RandomState(0)
    V, E, N, T = args.V, args.E, args.N, args.tables
    use_pallas = args.mode.endswith("pallas")

    tables = [jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
              for _ in range(T)]
    accs = [jnp.full((V, 1), 0.1, jnp.float32) for _ in range(T)]
    # 8 pre-generated id sets per table, cycled across steps
    raw_ids = jnp.asarray(rng.randint(0, V, (8, T, N)).astype(np.int32))
    upds = jnp.asarray((rng.standard_normal((8, T, N, E)) * 1e-4)
                       .astype(np.float32))

    if args.mode.startswith("scatter"):
        # pure scatter of pre-sorted unique ids (kernel in isolation)
        sorted_ids = np.sort(np.asarray(raw_ids), axis=-1)
        # dedupe -> pad with V (sortedness preserved)
        uid_sets = np.full((8, T, N), V, np.int32)
        for s in range(8):
            for t in range(T):
                u = np.unique(sorted_ids[s, t])
                uid_sets[s, t, :len(u)] = u
        uid_sets = jnp.asarray(uid_sets)

        @jax.jit
        def step(tables, s):
            out = []
            for t in range(T):
                out.append(scatter_add_rows(
                    tables[t], uid_sets[s, t], upds[s, t],
                    assume_sorted=True)
                    if use_pallas else
                    tables[t].at[uid_sets[s, t]].add(
                        upds[s, t], mode="drop", indices_are_sorted=True))
            return out

        step(tables, 0)[0].block_until_ready()  # compile
        _ = float(tables[0][0, 0])  # force honest sync mode
        t0 = time.perf_counter()
        for i in range(args.steps):
            tables = step(tables, i % 8)
        jax.block_until_ready(tables)
        dt = (time.perf_counter() - t0) / args.steps
    else:
        # full engine update: sort + segment-sum + adagrad + scatter(s)
        @jax.jit
        def step(tables, accs, s):
            new_t, new_a = [], []
            for t in range(T):
                nt, na = _rowwise_adagrad_scatter(
                    tables[t], accs[t], raw_ids[s, t], upds[s, t],
                    0.01, 1e-10, use_pallas=use_pallas)
                new_t.append(nt)
                new_a.append(na)
            return new_t, new_a

        jax.block_until_ready(step(tables, accs, 0))  # compile
        _ = float(tables[0][0, 0])  # force honest sync mode
        t0 = time.perf_counter()
        for i in range(args.steps):
            tables, accs = step(tables, accs, i % 8)
        jax.block_until_ready(tables)
        dt = (time.perf_counter() - t0) / args.steps

    # delivered row traffic: read+write of N unique rows per table
    nuniq = N if V > 20 * N else int(V * (1 - np.exp(-N / V)))
    gbps = 2 * T * nuniq * E * 4 / dt / 1e9
    print('{"metric": "%s_ms_per_step", "value": %.3f, "unit": "ms", '
          '"tables": %d, "V": %d, "E": %d, "N": %d, "row_gbps": %.1f}'
          % (args.mode, dt * 1e3, T, V, E, N, gbps))


if __name__ == "__main__":
    main()
