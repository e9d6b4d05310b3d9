"""Small-vocab gather as a one-hot MXU matmul with the table VMEM-resident.

Hypothesis: for SMALL tables (V*E a few hundred KB) the random-row HBM
gather that dominates sequence models (hist_cate: 205k rows from a
1k-vocab table) can be served as ``onehot(ids) @ table`` inside one
Pallas kernel: the table is fetched to VMEM once (revisited block), the
(rows, V) one-hot never exists in HBM, and the contraction runs on the
MXU at K=V utilization instead of ~6-12 ns per random row.

This differs from the round-2 "table-resident VMEM gather" dead end
(tools/bench_vmem_gather.py): that design needed per-row dynamic slices
(8-sublane alignment -> 64x copy amplification) or a lane-split reshape
(does not lower). Here there are no dynamic slices and no lane reshapes —
just iota-compare + matmul.

Backward note: the same trick serves the scatter (dTable = onehot^T @
dRows, a (V, rows-chunk) x (chunk, E) matmul accumulated over chunks).

    PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
        python tools/bench_matmul_gather.py [--rows 204800] [--vocab 1024]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def make_kernel(V, E, R, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(ids_ref, table_ref, out_ref):
        ids = ids_ref[0, 0]  # (R,) int32 in VMEM as (1, 1, R)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (R, V), 1) == ids[:, None]
        ).astype(table_ref.dtype)
        out_ref[:] = jax.lax.dot_general(
            onehot, table_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)

    def gather(ids, table):
        N = ids.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(N // R,),
            in_specs=[
                # 3D block whose last two dims EQUAL the array dims (the
                # Mosaic (8,128)-divisibility rule exempts full dims)
                pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0)),
                # same block every step -> fetched to VMEM once, revisited
                pl.BlockSpec((V, E), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((R, E), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, E), table.dtype),
            interpret=interpret,
        )(ids.reshape(N // R, 1, R), table)

    return gather


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=204800)  # 4096 x 50
    ap.add_argument("--vocab", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    N, V, E, R = args.rows, args.vocab, args.dim, args.chunk
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.standard_normal((V, E)), jnp.float32)
    ids = jnp.asarray(rng.randint(0, V, (N,)).astype(np.int32))

    gather = make_kernel(V, E, R, args.interpret)
    fused = jax.jit(lambda i, t: gather(i, t).sum())
    xla = jax.jit(lambda i, t: jnp.take(t, i, axis=0).sum())

    # Correctness: compare ROWS elementwise on a slice. (A global 200k-row
    # f32 sum is the wrong check — it cancels catastrophically and failed
    # spuriously at some shapes, the round-3 "block-shape bug".) The MXU
    # one-hot matmul runs bf16 input passes -> bf16-class row tolerance.
    rows_fused = np.asarray(gather(ids[:R], table))
    rows_xla = np.asarray(jnp.take(table, ids[:R], axis=0))
    np.testing.assert_allclose(rows_fused, rows_xla, rtol=1e-2, atol=1e-2)

    a, b = fused(ids, table), xla(ids, table)
    jax.block_until_ready((a, b))
    _ = float(a)  # honest mode

    out = {"rows": N, "vocab": V, "dim": E, "chunk": R}
    for name, f in (("matmul_gather", fused), ("xla_take", xla)):
        t0 = time.perf_counter()
        for _ in range(args.reps):
            s = f(ids, table)
        jax.block_until_ready(s)
        _ = float(s)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        out[name + "_ms"] = round(ms, 3)
        out[name + "_ns_per_row"] = round(ms * 1e6 / N, 2)
    out["speedup"] = round(out["xla_take_ms"] / out["matmul_gather_ms"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
