"""Row-traffic microbench: what a random row gather / scatter-add REALLY
costs on this chip, vs the sequential-stream rate.

The criteo-shaped workload moves embedding rows of 32 B (E=16 bf16), but
HBM serves random accesses at line granularity, so each row costs a full
line regardless of its logical size.  This bench measures, in one honest
process (CLAUDE.md measurement discipline):

  1. sequential stream rate over a 256 MB buffer (the roofline denominator)
  2. gather of R random rows from a stacked (2.6M, E) bf16 table
  3. scatter-add of R rows into the same table
  4. the same pair at E=256 (1 KB rows, minimal line waste) for contrast

From (2)/(3) vs (1) we derive the effective bytes-per-row the hardware
charges, which calibrates bench.py's roofline traffic model.

    python tools/bench_rowtraffic.py [--rows 851968] [--vocab 2600000]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def timeit(fn, *args, n=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])  # honest mode
    t0 = time.perf_counter()
    for _i in range(n):
        o = fn(*args)
    jax.block_until_ready(o)
    _ = float(np.asarray(jax.tree.leaves(o)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=26 * 32768)
    ap.add_argument("--vocab", type=int, default=26 * 100_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    R, V = args.rows, args.vocab
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, V, (R,)).astype(np.int32))

    # 1. sequential stream
    buf = jnp.zeros((64 * 1024 * 1024,), jnp.float32)  # 256 MB

    @jax.jit
    def stream(b):
        def body(x, _):
            return x * 1.0000001 + 1e-12, ()
        out, _ = jax.lax.scan(body, b, None, length=10)
        return out

    dt = timeit(stream, buf)
    stream_gbps = 10 * 2 * buf.nbytes / dt / 1e9
    print(json.dumps({"which": "stream", "gbps": round(stream_gbps, 1)}), flush=True)
    del buf

    for E, dtype in ((16, jnp.bfloat16), (256, jnp.bfloat16)):
        table = jnp.asarray(rng.standard_normal((V, E)), dtype)
        rows = jnp.asarray(rng.standard_normal((R, E)), dtype)

        @jax.jit
        def gather(t, i):
            # chain: 4 dependent gathers (id perturbation keeps them random)
            def body(carry, _):
                s, i2 = carry
                r = jnp.take(t, i2, axis=0)
                s = s + r.astype(jnp.float32).sum()
                i2 = (i2 + 12345) % V
                return (s, i2), ()
            (s, _), _ = jax.lax.scan(body, (jnp.zeros(()), i), None, length=4, unroll=4)
            return s

        @jax.jit
        def scatter(t, i, r):
            def body(carry, _):
                t2, i2 = carry
                t2 = t2.at[i2].add(r)
                i2 = (i2 + 12345) % V
                return (t2, i2), ()
            (t2, _), _ = jax.lax.scan(body, (t, i), None, length=4, unroll=4)
            return t2

        dt = timeit(gather, table, ids)
        per_row_ns = dt / (4 * R) * 1e9
        eff_bytes = stream_gbps * 1e9 * dt / (4 * R)
        print(json.dumps({
            "which": "gather", "E": E, "rows": R,
            "ms_per_pass": round(dt / 4 * 1e3, 3),
            "ns_per_row": round(per_row_ns, 1),
            "effective_bytes_per_row_at_stream_rate": round(eff_bytes, 0),
            "logical_bytes_per_row": E * 2,
        }), flush=True)

        dt = timeit(scatter, table, ids, rows)
        per_row_ns = dt / (4 * R) * 1e9
        eff_bytes = stream_gbps * 1e9 * dt / (4 * R)
        print(json.dumps({
            "which": "scatter_add", "E": E, "rows": R,
            "ms_per_pass": round(dt / 4 * 1e3, 3),
            "ns_per_row": round(per_row_ns, 1),
            "effective_bytes_per_row_at_stream_rate": round(eff_bytes, 0),
            "logical_bytes_per_row": E * 2,
        }), flush=True)
        del table, rows


if __name__ == "__main__":
    main()
