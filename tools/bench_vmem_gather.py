"""Microbench: can a table-resident-in-VMEM Pallas gather beat XLA's
dynamic-gather for small CTR tables?

Motivation (round 2): the criteo-shape train step is bound by RANDOM row
traffic — 26 forward gathers + 26 backward scatter-adds of ~32B rows,
measured ~6 ns/row whatever XLA path serves them (line-granular HBM
access with bounded outstanding transactions). But a 100k x 16 bf16
table is only 3.2 MB: it FITS in VMEM. If the whole table streams into
VMEM once (sequential, ~14 us) and rows are then selected on-chip, the
per-row cost is a VPU dynamic-sublane copy (~2-4 cycles ≈ 2-4 ns) — a
potential ~2x on the dominant step component.

This bench times, in one process/window (honest mode):
  xla_take_stacked   : one jnp.take of T*B rows from a stacked table
  xla_take_pertable  : T separate jnp.take ops (the model's layout)
  pallas_vmem        : the table-resident kernel below, T tables
  xla_scatter_stacked: one .at[].add of T*B rows (backward analog)

    python tools/bench_vmem_gather.py [--batch 32768] [--tables 26]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def make_vmem_gather(V, E, C, dtype, interpret=False):
    """Return fn(lines (Vl,128), ids (B,)) -> rows (B,E)  [f32 only].

    Table is viewed as (Vl, 128) f32 lines holding k = 128//E rows each
    (free reshape; E must divide 128). The WHOLE line array is a single
    VMEM block (revisited across the id-chunk grid, so it is DMA'd in
    once). Mosaic only allows ALIGNED dynamic sublane slices, so each
    grid step copies, per id, the aligned (8, 128) tile holding its line
    (8*k rows) into scratch, then selects every id's row with one batched
    one-hot contraction over the 8*k candidates (pure VPU work).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = 128 // E
    Vl = V * E // 128
    R = 8 * k  # rows per aligned (8, 128) tile

    def kernel(tid_ref, slot_ref, lines_ref, out_ref, scratch):
        def body(j, _):
            base = pl.multiple_of(tid_ref[0, j] * 8, 8)
            dst = pl.multiple_of(j * 8, 8)
            scratch[pl.ds(dst, 8), :] = lines_ref[pl.ds(base, 8), :]
            return 0

        jax.lax.fori_loop(0, C, body, 0)
        tile = scratch[:].reshape(C, R, E)
        sel = jax.lax.broadcasted_iota(jnp.int32, (C, R), 1)
        onehot = (sel == slot_ref[:].reshape(C)[:, None]).astype(tile.dtype)
        out_ref[:] = jnp.sum(tile * onehot[:, :, None], axis=1)

    def gather(lines, ids):
        B = ids.shape[0]
        assert B % C == 0
        tile_ids = ids // R          # which aligned (8,128) tile
        slots = ids % R              # row within the tile
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B // C,),
            in_specs=[
                pl.BlockSpec((1, C), lambda c: (0, c), memory_space=pltpu.SMEM),
                pl.BlockSpec((C,), lambda c: (c,)),
                pl.BlockSpec((Vl, 128), lambda c: (0, 0)),  # whole table, revisited
            ],
            out_specs=pl.BlockSpec((C, E), lambda c: (c, 0)),
            scratch_shapes=[pltpu.VMEM((C * 8, 128), dtype)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, E), dtype),
            interpret=interpret,
        )(tile_ids.reshape(1, B), slots, lines)

    return gather


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, T, V, E = args.batch, args.tables, args.vocab, args.dim
    k = 128 // E
    # pad V so the line view (Vl, 128) exists and is 8-sublane aligned
    V += ((-V * E) % (128 * 8)) // E
    Vl = V * E // 128
    dtype = jnp.float32  # aligned-tile kernel is f32-lines only

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.standard_normal((T * V, E)), dtype)
    ids = jnp.asarray(rng.randint(0, V, (T, B)).astype(np.int32))
    stacked_ids = (ids + (jnp.arange(T) * V)[:, None]).reshape(-1)
    rows = jnp.asarray(rng.standard_normal((T * B, E)), dtype)

    gather1 = make_vmem_gather(V, E, args.chunk, dtype,
                               interpret=args.interpret)

    @jax.jit
    def pallas_all(table, ids):
        lines = table.reshape(T, Vl, 128)
        outs = [gather1(lines[t], ids[t]) for t in range(T)]
        return jnp.stack(outs).astype(jnp.float32).sum()

    @jax.jit
    def xla_stacked(table, sids):
        return jnp.take(table, sids, axis=0).astype(jnp.float32).sum()

    @jax.jit
    def xla_pertable(table, ids):
        tt = table.reshape(T, V, E)
        outs = [jnp.take(tt[t], ids[t], axis=0) for t in range(T)]
        return jnp.stack(outs).astype(jnp.float32).sum()

    @jax.jit
    def xla_scatter(table, sids, rows):
        return table.at[sids].add(rows)

    # correctness (always, cheap at small shapes under --interpret)
    ref = jnp.take(table.reshape(T, V, E)[0], ids[0], axis=0)
    got = gather1(table.reshape(T, Vl, 128)[0], ids[0])
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    print("# correctness ok", flush=True)

    fns = {
        "xla_take_stacked": lambda: xla_stacked(table, stacked_ids),
        "xla_take_pertable": lambda: xla_pertable(table, ids),
        "pallas_vmem": lambda: pallas_all(table, ids),
        "xla_scatter_stacked": lambda: xla_scatter(table, stacked_ids, rows),
    }
    # warmup + honest mode
    for f in fns.values():
        out = f()
        jax.block_until_ready(out)
    _ = float(jnp.asarray(out).reshape(-1)[0])

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

    out = {"batch": B, "tables": T, "rows": T * B, "chunk": args.chunk}
    for n, v in results.items():
        ms = float(np.median(v))
        out[n + "_ms"] = round(ms, 3)
        out[n + "_ns_per_row"] = round(ms * 1e6 / (T * B), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
