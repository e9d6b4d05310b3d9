"""Embedding-lookup bandwidth bench (BASELINE.md north star: lookup GB/s).

Measures the gather path on one chip: bytes of embedding rows delivered per
second for a Criteo-shaped lookup burst (26 tables x batch ids), plus the
speed-of-light fraction vs. ~800 GB/s usable v5e HBM bandwidth for
gather-sized rows. Prints one JSON line per configuration.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main(configs=None, steps=50):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    if configs is None:
        configs = [(26, 100_000, 16, 32768), (26, 100_000, 128, 8192)]
    for (n_tables, V, E, B) in configs:
        tables = [
            jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
            for _ in range(n_tables)
        ]
        idss = [
            jnp.asarray(rng.randint(0, V, B).astype(np.int32))
            for _ in range(n_tables)
        ]

        @jax.jit
        def burst(tables, idss):
            # materialize every gathered row block: measures the real
            # gather (read) + write path, immune to algebraic collapsing
            return [jnp.take(t, i, axis=0) for t, i in zip(tables, idss)]

        out = burst(tables, idss)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = burst(tables, idss)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / steps
        gb = n_tables * B * E * 4 / 1e9
        print(json.dumps({
            "metric": "embedding_lookup_bandwidth",
            "config": "%dx(%d,%d) batch %d" % (n_tables, V, E, B),
            "value": round(gb / dt, 1),
            "unit": "GB/s",
        }))


if __name__ == "__main__":
    main()
