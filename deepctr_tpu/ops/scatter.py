"""Pallas TPU kernel: in-place row scatter-update for embedding tables.

XLA's scatter on TPU degrades badly in some program contexts (see
CLAUDE.md measurement notes); this kernel sidesteps XLA's scatter lowering
entirely with explicit row DMAs: for each (unique) id, read the table row
HBM->VMEM, apply the update, write it back. The table is aliased in/out
(``input_output_aliases``) so no full-table copy is made.

Contract:
- ``uids`` must be duplicate-free among valid entries (the sparse engine's
  sort + segment-sum produces exactly this); rows with ``uids[i] >= V`` are
  skipped (padding convention of sparse_embedding._rowwise_adagrad_scatter).
- Compiled mode requires E to be a multiple of 128 (Mosaic DMA lane
  alignment); other dims fall back to XLA's scatter — padding would force a
  full padded-table copy, the exact O(V*E) traffic this kernel avoids.

``scatter_add_rows(table, uids, updates)`` returns the updated table.
Use ``interpret=True`` on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 64  # ids per grid step; ring-buffered deeper pipelining is a TODO
# (raising this to 512 exceeded the DMA-semaphore budget in compiled mode)


def _scatter_kernel(uids_ref, upd_ref, table_ref, out_ref, scratch, sems, *, V):
    # out_ref aliases table_ref's buffer; we only touch the addressed rows.
    # uids_ref is an (8, 8) SMEM tile: id k lives at [k // 8, k % 8].
    def row_dma_in(k, uid):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(uid, 1), :], scratch.at[pl.ds(k, 1), :],
            sems.at[k],
        )

    def row_dma_out(k, uid):
        return pltpu.make_async_copy(
            scratch.at[pl.ds(k, 1), :], out_ref.at[pl.ds(uid, 1), :],
            sems.at[k],
        )

    def start_read(k, _):
        uid = uids_ref[k // 8, k % 8]
        safe = jnp.minimum(uid, V - 1)

        @pl.when(uid < V)
        def _():
            row_dma_in(k, safe).start()

        return 0

    jax.lax.fori_loop(0, _TILE_N, start_read, 0)

    def finish_row(k, _):
        uid = uids_ref[k // 8, k % 8]
        safe = jnp.minimum(uid, V - 1)

        @pl.when(uid < V)
        def _():
            row_dma_in(k, safe).wait()
            scratch[k, :] = scratch[k, :] + upd_ref[k, :]
            row_dma_out(k, safe).start()

        return 0

    jax.lax.fori_loop(0, _TILE_N, finish_row, 0)

    def wait_out(k, _):
        uid = uids_ref[k // 8, k % 8]
        safe = jnp.minimum(uid, V - 1)

        @pl.when(uid < V)
        def _():
            row_dma_out(k, safe).wait()

        return 0

    jax.lax.fori_loop(0, _TILE_N, wait_out, 0)


def scatter_add_rows(table, uids, updates, interpret: bool = False):
    """table[uids[i]] += updates[i] for uids[i] < V; uids unique among valid.

    Returns the updated table (the input buffer is donated/aliased).
    """
    V, E_in = table.shape
    N = uids.shape[0]
    if not interpret and E_in % 128 != 0:
        # Padding the lane dim would require a FULL padded table copy per
        # call — exactly the O(V*E) traffic this kernel exists to avoid.
        # Small-dim tables stay on XLA's scatter instead.
        return table.at[uids].add(updates, mode="drop")
    E = E_in
    pad_n = (-N) % _TILE_N
    if pad_n:
        uids = jnp.concatenate(
            [uids, jnp.full((pad_n,), V, uids.dtype)]  # padded -> skipped
        )
        updates = jnp.concatenate(
            [updates, jnp.zeros((pad_n, E), updates.dtype)]
        )
    Np = N + pad_n
    uids2d = uids.reshape(Np // 8, 8).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Np // _TILE_N,),
        in_specs=[
            pl.BlockSpec((_TILE_N // 8, 8), lambda n: (n, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE_N, E), lambda n: (n, 0)),  # updates (VMEM)
            pl.BlockSpec(memory_space=pl.ANY),  # table in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # aliased table
        scratch_shapes=[
            pltpu.VMEM((_TILE_N, E), table.dtype),
            pltpu.SemaphoreType.DMA((_TILE_N,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, V=V),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, E), table.dtype),
        input_output_aliases={2: 0},  # table buffer updated in place
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(uids2d, updates, table)
    return out
