"""Physics probe for history-row dedup (VERDICT r3 item 7).

Sequence models gather B*T history rows per step (4096*50 = 204.8k rows —
50x a criteo model's traffic). A dedup stage could only pay if XLA's
gather serves REPEATED rows cheaper than distinct ones (HBM row-buffer /
cache locality). This measures per-row gather cost at fixed id count
while sweeping the UNIQUE-row pool size, plus a sorted-ids variant:

  - if cost/row is flat in pool size, repeats are not cheaper -> a
    static-shape dedup cannot win and the idea is dead (record it);
  - if cost/row falls with a small pool, a sort/unique path has headroom.

Run: env PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/bench_hist_dedup.py
"""
from __future__ import annotations

import json
import time

import numpy as np

B, T, V, E = 4096, 50, 200_000, 32
STEPS = 30


def measure(ids_np, table, tag):
    import jax
    import jax.numpy as jnp

    ids = jnp.asarray(ids_np)

    @jax.jit
    def chain(table, ids, acc):
        for _ in range(5):
            rows = jnp.take(table, ids, axis=0, mode="clip")
            acc = acc + rows.sum()
            ids = (ids + 1) % V  # new random-ish rows each inner iter
        return acc

    acc = jnp.zeros((), jnp.float32)
    acc = chain(table, ids, acc)
    _ = float(acc)  # honest mode
    t0 = time.time()
    for _ in range(STEPS):
        acc = chain(table, ids, acc)
    _ = float(acc)
    dt = time.time() - t0
    rows_served = STEPS * 5 * ids_np.size
    ns_per_row = dt / rows_served * 1e9
    print(json.dumps({"metric": "gather_ns_per_row", "case": tag,
                      "ids": int(ids_np.size),
                      "ns_per_row": round(ns_per_row, 2),
                      "ms_per_chain": round(dt / STEPS * 1e3, 3)}))
    return ns_per_row


def main():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    n = B * T
    # pool sweep: how many DISTINCT rows the n gathered ids touch
    for pool in (V, 65536, 16384, 4096, 1024):
        ids = rng.randint(0, pool, n).astype(np.int32)
        measure(ids, table, "pool_%d" % pool)
    ids = rng.randint(0, V, n).astype(np.int32)
    measure(np.sort(ids), table, "sorted_full_pool")


if __name__ == "__main__":
    main()
