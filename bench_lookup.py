"""Embedding-lookup bandwidth bench (BASELINE.md north star: lookup GB/s).

Measures bytes of embedding rows delivered per second for a Criteo-shaped
lookup burst (26 tables x batch ids). Steps are CHAINED — the next step's
ids derive from the previous gather's output — because unchained
same-input loops on this backend measure dispatch, not compute
(CLAUDE.md measurement discipline). Prints one JSON line per config.

``--mesh`` additionally benches the two explicit row-sharded strategies
(parallel/sharded_lookup.py): replicated-compute+psum vs all-to-all
exchange, on a (data x model) mesh over the available devices.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _bench_chained(step_fn, state0, steps, bytes_per_step):
    import jax
    import numpy as np

    state = step_fn(state0)
    jax.block_until_ready(state)
    # Force the client into synchronous (honest) mode: on the axon backend
    # block_until_ready does NOT flush before the process's first
    # device->host read — pre-read timings are dispatch-only fantasy
    # (CLAUDE.md measurement discipline).
    _ = int(np.asarray(jax.tree.leaves(state)[0]).reshape(-1)[0])
    state = state0
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step_fn(state)
    jax.block_until_ready(state)
    _ = int(np.asarray(jax.tree.leaves(state)[0]).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / steps
    return bytes_per_step / dt / 1e9, dt


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
        ids0 = [
            jnp.asarray(rng.randint(0, V, B).astype(np.int32))
            for _ in range(n_tables)
        ]

        @jax.jit
        def step(idss):
            outs = [jnp.take(t, i, axis=0) for t, i in zip(tables, idss)]
            # derive next ids from the gathered values: a real data
            # dependency so steps can't overlap/dedupe
            shift = sum(
                jax.lax.convert_element_type(o[0, 0] * 1e6, jnp.int32)
                for o in outs
            )
            return [(i + 1 + (shift % 97)) % V for i in idss]

        gb = n_tables * B * E * 4
        gbps, dt = _bench_chained(step, ids0, steps, gb)
        print(json.dumps({
            "metric": "embedding_lookup_bandwidth",
            "config": "%dx(%d,%d) batch %d" % (n_tables, V, E, B),
            "value": round(gbps, 1),
            "unit": "GB/s (delivered rows, chained)",
        }))


def main_mesh(steps=30):
    import jax
    import jax.numpy as jnp

    from deepctr_tpu.parallel.mesh import make_mesh
    from deepctr_tpu.parallel.sharded_lookup import (
        place_for_sharded_lookup, sharded_lookup, sharded_lookup_a2a)

    devices = jax.devices()
    n = len(devices)
    model_par = 2 if n % 2 == 0 and n >= 4 else 1
    mesh = make_mesh((n // model_par, model_par), ("data", "model"),
                     devices[:n])
    rng = np.random.RandomState(0)
    V, E, B = 131_072, 64, 65_536
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V, B).astype(np.int32))
    t_s, i_s = place_for_sharded_lookup(table, ids, mesh)

    for name, fn in (("psum", sharded_lookup), ("all_to_all", sharded_lookup_a2a)):
        lookup = jax.jit(lambda i, _f=fn: _f(t_s, i, mesh))

        def step(i):
            out = lookup(i)
            shift = jax.lax.convert_element_type(out[0, 0] * 1e6, jnp.int32)
            return (i + 1 + (shift % 97)) % V

        gbps, dt = _bench_chained(jax.jit(step), i_s, steps, B * E * 4)
        print(json.dumps({
            "metric": "sharded_lookup_bandwidth",
            "strategy": name,
            "mesh": dict(mesh.shape),
            "backend": jax.default_backend(),
            "value": round(gbps, 2),
            "unit": "GB/s (delivered rows, chained)",
        }))


if __name__ == "__main__":
    if "--mesh" in sys.argv:
        main_mesh()
    else:
        main()
