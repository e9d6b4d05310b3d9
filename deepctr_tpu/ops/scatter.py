"""Pallas TPU kernel: in-place row scatter-update for embedding tables.

XLA's scatter on TPU degrades badly in some program contexts (see
CLAUDE.md measurement notes); this kernel sidesteps XLA's scatter lowering
entirely with explicit row DMAs: for each (unique) addressed line, read it
HBM->VMEM, apply the update, write it back. The table is aliased in/out
(``input_output_aliases``) so no full-table copy is made.

v2 design (round 2):

- **Lane-line packing removes the E % 128 restriction.** Mosaic DMAs want
  128-lane transfers, but real CTR embedding dims are small (E=16). The
  (V, E) table is viewed as (V*E/128, 128) "lines" — a free row-major
  reshape — and each row update is placed into its line at lane offset
  (uid % k) * E with k = 128 // E rows per line. Adjacent updates touching
  the same line are pre-summed (ids arrive sorted, so line dedup is an
  adjacency segment-sum). Works for any E with 128 % E == 0 or
  E % 128 == 0 and V*E % 128 == 0; other shapes fall back to XLA scatter.
- **Double-buffered DMA pipeline.** Two scratch slots alternate across
  grid steps: while slot A's write-backs drain, slot B's reads stream in,
  so the read->modify->write pipeline never fully serializes at tile
  boundaries. Per-slot uids persist in SMEM scratch so a later grid step
  can wait exactly the DMAs an earlier one started.

Contract of ``scatter_add_rows(table, uids, updates)``:
- ``uids`` must be **sorted ascending and duplicate-free among valid
  entries** (the sparse engine's sort + segment-sum produces exactly this);
  entries with ``uids[i] < 0`` or ``>= V`` are skipped (padding).
- Returns the updated table (the input buffer is donated/aliased).
- Use ``interpret=True`` on CPU.

Replaces the per-table dense optimizer writes the reference performs
through Keras Embedding updates (/root/reference/deepctr/inputs.py:19-26).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 64   # lines per grid step per slot (128 outstanding DMA sems total)
_N_SLOTS = 2   # double buffering across grid steps


def _scatter_lines_kernel(uids_ref, upd_ref, table_ref, out_ref,
                          scratch, uid_smem, rsems, wsems, *, V):
    """One grid step: RMW _TILE_N table lines through VMEM scratch.

    out_ref aliases table_ref's buffer; only addressed lines are touched.
    uids_ref is a (_TILE_N // 8, 8) SMEM tile: id k lives at [k // 8, k % 8].
    """
    i = pl.program_id(0)
    slot = i % _N_SLOTS

    def write_dma(s, k, uid):
        return pltpu.make_async_copy(
            scratch.at[s, pl.ds(k, 1), :], out_ref.at[pl.ds(uid, 1), :],
            wsems.at[s, k],
        )

    def read_dma(s, k, uid):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(uid, 1), :], scratch.at[s, pl.ds(k, 1), :],
            rsems.at[s, k],
        )

    # 1. Drain the write-backs issued _N_SLOTS steps ago on this slot (their
    #    uids persist in SMEM) so its scratch/semaphores can be reused.
    def drain_prev(k, _):
        uid_prev = uid_smem[slot, k]

        @pl.when((i >= _N_SLOTS) & (uid_prev >= 0) & (uid_prev < V))
        def _():
            write_dma(slot, k, uid_prev).wait()

        return 0

    jax.lax.fori_loop(0, _TILE_N, drain_prev, 0)

    # 2. Start all reads for this tile (they stream while we process).
    def start_read(k, _):
        uid = uids_ref[k // 8, k % 8]
        uid_smem[slot, k] = uid

        @pl.when((uid >= 0) & (uid < V))
        def _():
            read_dma(slot, k, uid).start()

        return 0

    jax.lax.fori_loop(0, _TILE_N, start_read, 0)

    # 3. Read-modify-write: wait read k, add update, start write-back k.
    #    Reads k+1.. are still in flight while k is processed.
    def rmw(k, _):
        uid = uids_ref[k // 8, k % 8]

        @pl.when((uid >= 0) & (uid < V))
        def _():
            read_dma(slot, k, uid).wait()
            scratch[slot, k, :] = scratch[slot, k, :] + upd_ref[k, :]
            write_dma(slot, k, uid).start()

        return 0

    jax.lax.fori_loop(0, _TILE_N, rmw, 0)

    # 4. Last grid step: no step i+_N_SLOTS will drain us — drain everything.
    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        def drain_all(k, _):
            uid = uids_ref[k // 8, k % 8]

            @pl.when((uid >= 0) & (uid < V))
            def _():
                write_dma(slot, k, uid).wait()

            other = (slot + 1) % _N_SLOTS
            uid_o = uid_smem[other, k]

            @pl.when((i >= 1) & (uid_o >= 0) & (uid_o < V))
            def _():
                write_dma(other, k, uid_o).wait()

            return 0

        jax.lax.fori_loop(0, _TILE_N, drain_all, 0)


def _scatter_lines(lines, line_ids, line_updates, interpret):
    """lines (Vl, 128) += line_updates at line_ids; invalid ids skipped.

    line_ids must be unique among valid entries (no two concurrent RMWs of
    the same line). Returns the updated lines (buffer aliased).
    """
    Vl = lines.shape[0]
    N = line_ids.shape[0]
    pad_n = (-N) % _TILE_N
    if pad_n:
        line_ids = jnp.concatenate(
            [line_ids, jnp.full((pad_n,), Vl, line_ids.dtype)]
        )
        line_updates = jnp.concatenate(
            [line_updates, jnp.zeros((pad_n, 128), line_updates.dtype)]
        )
    Np = N + pad_n
    uids2d = line_ids.reshape(Np // 8, 8).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Np // _TILE_N,),
        in_specs=[
            pl.BlockSpec((_TILE_N // 8, 8), lambda n: (n, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE_N, 128), lambda n: (n, 0)),  # updates (VMEM)
            pl.BlockSpec(memory_space=pl.ANY),  # table lines in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # aliased table
        scratch_shapes=[
            pltpu.VMEM((_N_SLOTS, _TILE_N, 128), lines.dtype),
            pltpu.SMEM((_N_SLOTS, _TILE_N), jnp.int32),
            pltpu.SemaphoreType.DMA((_N_SLOTS, _TILE_N)),
            pltpu.SemaphoreType.DMA((_N_SLOTS, _TILE_N)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_scatter_lines_kernel, V=Vl),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Vl, 128), lines.dtype),
        input_output_aliases={2: 0},  # table buffer updated in place
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(uids2d, line_updates, lines)


def pallas_scatter_supported(V: int, E: int) -> bool:
    """Shapes the DMA kernel handles; others use the XLA fallback."""
    if E % 128 == 0:
        return True
    return 128 % E == 0 and 128 // E <= 16 and (V * E) % 128 == 0


def scatter_add_rows(table, uids, updates, interpret: bool = False,
                     assume_sorted: bool = False):
    """table[uids[i]] += updates[i] for valid uids[i]; see module contract.

    uids must be unique among valid entries. The lane-packed small-E path
    additionally needs them sorted ascending (padding at the end);
    ``assume_sorted=True`` skips the internal argsort (the sparse engine's
    ids are sorted by construction).
    Returns the updated table (input buffer aliased).
    """
    V, E = table.shape
    N = uids.shape[0]
    uids = uids.astype(jnp.int32)
    if (not assume_sorted and E % 128 != 0 and 128 % E == 0
            and 128 // E <= 16 and (V * E) % 128 == 0):
        order = jnp.argsort(uids)
        uids = uids[order]
        updates = updates[order]

    if E % 128 == 0:
        # m whole lines per row; line ids stay sorted & unique.
        m = E // 128
        Vl = V * m
        valid = (uids >= 0) & (uids < V)
        if m == 1:
            line_ids = jnp.where(valid, uids, Vl)
            line_upd = updates
        else:
            line_ids = jnp.where(
                jnp.repeat(valid, m),
                (uids[:, None] * m + jnp.arange(m)[None, :]).reshape(-1),
                Vl,
            )
            line_upd = updates.reshape(N * m, 128)
        out = _scatter_lines(table.reshape(Vl, 128), line_ids, line_upd,
                             interpret)
        return out.reshape(V, E)

    if 128 % E == 0 and 128 // E <= 16 and (V * E) % 128 == 0:
        # Lane-line packing: k rows per 128-lane line. (k capped at 16: the
        # dedup below costs k-1 shifted adds; E < 8 goes to the fallback.)
        k = 128 // E
        Vl = V * E // 128
        valid = (uids >= 0) & (uids < V)
        line_of = jnp.where(valid, uids // k, Vl)
        slot = jnp.where(valid, uids % k, 0)
        # place each E-wide update at lane offset slot*E within its line
        onehot = jax.nn.one_hot(slot, k, dtype=updates.dtype)  # (N, k)
        placed = (onehot[:, :, None] * updates[:, None, :]).reshape(N, 128)
        # Line dedup (no two concurrent RMWs of one line): ids are sorted and
        # row-unique, so one line's rows sit in at most k CONSECUTIVE
        # positions — exact within-line totals via k-1 masked shifted adds
        # (no scatter, no long-range cumsum cancellation).
        total = placed
        for d in range(1, min(k, N)):
            same = jnp.concatenate(
                [jnp.zeros((d,), bool), line_of[d:] == line_of[:-d]]
            )
            shifted = jnp.concatenate(
                [jnp.zeros((d, 128), placed.dtype), placed[:-d]]
            )
            total = total + jnp.where(same[:, None], shifted, 0.0)
        is_last = jnp.concatenate(
            [line_of[1:] != line_of[:-1], jnp.ones((1,), bool)]
        )
        line_ids = jnp.where(is_last & (line_of < Vl), line_of, Vl)
        line_upd = jnp.where(is_last[:, None], total, 0.0)
        out = _scatter_lines(table.reshape(Vl, 128), line_ids,
                             line_upd.astype(table.dtype), interpret)
        return out.reshape(V, E)

    # Shapes the line view can't express: XLA scatter (sorted-indices hint).
    return table.at[uids].add(updates, mode="drop",
                              indices_are_sorted=assume_sorted)
