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
    """Benches THREE lookup strategies on a (data x model) mesh —
    replicated-table (the memory-expensive baseline: every device holds
    the full table, ids sharded over 'data'), row-sharded + psum, and
    row-sharded + all-to-all — so the model-parallel overhead is a
    measured ratio, not a guess (VERDICT r4 weak #5)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

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

    t_rep = jax.device_put(table, NamedSharding(mesh, P(None, None)))
    i_dat = jax.device_put(ids, NamedSharding(mesh, P("data")))

    results = {}
    strategies = (
        ("replicated", lambda i: jnp.take(t_rep, i, axis=0)),
        ("psum", lambda i: sharded_lookup(t_s, i, mesh)),
        ("all_to_all", lambda i: sharded_lookup_a2a(t_s, i, mesh)),
    )
    for name, fn in strategies:
        lookup = jax.jit(fn)

        def step(i):
            out = lookup(i)
            shift = jax.lax.convert_element_type(out[0, 0] * 1e6, jnp.int32)
            return (i + 1 + (shift % 97)) % V

        i0 = i_dat if name == "replicated" else i_s
        gbps, dt = _bench_chained(jax.jit(step), i0, steps, B * E * 4)
        results[name] = gbps
        rec = {
            "metric": "sharded_lookup_bandwidth",
            "strategy": name,
            "mesh": dict(mesh.shape),
            "backend": jax.default_backend(),
            "value": round(gbps, 2),
            "unit": "GB/s (delivered rows, chained)",
        }
        if name != "replicated" and "replicated" in results:
            rec["vs_replicated"] = round(gbps / results["replicated"], 3)
        print(json.dumps(rec), flush=True)
    return results


def pinned_mesh_results(n_devices=4, steps=20):
    """main_mesh in a taskset-pinned subprocess (1 core per virtual
    device) — the honest virtual-mesh measurement (same rationale as
    bench_scaling.pinned_rate). Returns {strategy: GB/s}."""
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=%d"
                         % n_devices)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import jax; jax.config.update('jax_platforms','cpu')\n"
            "import bench_lookup\n"
            "bench_lookup.main_mesh(steps=%d)" % steps)
    out = subprocess.run(
        ["taskset", "-c", "0-%d" % (n_devices - 1), sys.executable,
         "-c", code],
        capture_output=True, text=True, env=env, cwd=here, timeout=600)
    results = {}
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            rec = json.loads(line)
            results[rec["strategy"]] = rec["value"]
    if not results:
        raise RuntimeError(out.stderr[-2000:])
    return results


if __name__ == "__main__":
    if "--mesh" in sys.argv:
        main_mesh()
    else:
        main()
