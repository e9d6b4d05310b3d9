"""Pallas TPU kernel: fused embedding gather + masked sequence pooling.

The hot op of every CTR model is the embedding path (SURVEY §2.1/§7): for a
varlen feature the reference materializes the gathered (B, T, E) sequence in
HBM and then reduces it (two passes — deepctr/inputs.py:133-158). This
kernel fuses both: rows stream from the HBM table straight into a VMEM
accumulator — the (B, T, E) intermediate never exists.

Mechanics (the canonical scalar-prefetch gather pattern):
- per-(b, t) element the kernel DMAs ONE 128-lane table line HBM->VMEM,
  addressed by scalars from an SMEM id tile;
- **small-E lane packing**: for E < 128 with 128 % E == 0 the (V, E) table
  is viewed as (V*E/128, 128) lines (free reshape) holding k = 128/E rows
  each; the needed row is selected in VMEM with a one-hot contraction over
  the k sublane groups. This makes every DMA a full 128-lane transfer at
  any real CTR embedding dim (16, 32, ...), instead of excluding them;
- combiner sum/mean/max matches sequence_pooling (layers/sequence.py:44-61).

``fused_gather_pool`` wraps the kernel in a custom_vjp whose backward
scatter-adds pooled cotangents into the table, so it is a drop-in training
op. Use ``interpret=True`` on CPU (tests) — compiled mode on TPU.

Integration: ``set_fused_gather_pool(True)`` (or
``CTRModel.compile(..., fused_gather_pool=True)``) routes every eligible
``EmbeddingTables.pool_varlen`` feature (sum/mean/max combiner, no
weight_name) through this kernel; everything else keeps the XLA path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_TILE_B = 8  # sublane granularity for the output tile

# process-wide funnel switch (see module docstring)
_FUSED_POOL = {"enabled": False, "interpret": False}


def set_fused_gather_pool(enabled: bool, interpret: bool = False):
    """Enable/disable the fused gather+pool path inside EmbeddingTables."""
    _FUSED_POOL["enabled"] = bool(enabled)
    _FUSED_POOL["interpret"] = bool(interpret)


def fused_pool_enabled():
    return _FUSED_POOL["enabled"]


def fused_pool_interpret():
    return _FUSED_POOL["interpret"]


# per grid step the kernel holds a (TILE_B*T, 128) VMEM scratch and
# TILE_B*T DMA semaphores; cap T so long sequences fall back to the XLA
# path instead of exhausting VMEM/semaphores at Mosaic compile time
_MAX_T = 256


def fused_pool_supported(V: int, E: int, combiner: str, weighted: bool,
                         maxlen: Optional[int] = None) -> bool:
    if weighted or combiner not in ("sum", "mean", "max"):
        return False
    if maxlen is not None and maxlen > _MAX_T:
        return False
    if E % 128 == 0:
        return True
    return 128 % E == 0 and (V * E) % 128 == 0


def _pool_kernel(ids_ref, slot_ref, mask_ref, table_ref, out_ref, scratch,
                 sems, *, T, k, E, combiner):
    """One grid step pools _TILE_B examples.

    ids_ref is this tile's (TILE_B, T) LINE-id block in SMEM — scalar reads
    drive the per-line DMA addressing. slot_ref (VMEM) carries each
    element's sub-line row index (0 when k == 1).
    """
    def line_dma(j):
        line_id = ids_ref[j // T, j % T]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(line_id, 1), :],
            scratch.at[pl.ds(j, 1), :],
            sems.at[j],
        )

    def start_dma(j, _):
        line_dma(j).start()
        return 0

    jax.lax.fori_loop(0, _TILE_B * T, start_dma, 0)

    def wait_dma(j, _):
        line_dma(j).wait()
        return 0

    jax.lax.fori_loop(0, _TILE_B * T, wait_dma, 0)

    if k == 1:
        rows = scratch[:].reshape(_TILE_B, T, E)
    else:
        # Select each element's row from its 128-lane line. A direct
        # (N, 128) -> (N, k, E) reshape splits the LANE dim, which Mosaic
        # cannot lower ("infer-vector-layout: unsupported shape cast"),
        # so: (1) zero every lane outside the element's E-wide sub-group
        # with a lane-iota mask, (2) fold the 128 lanes down to E with a
        # constant 0/1 (128, E) matmul on the MXU — the one lane-space
        # permutation that lowers cleanly. Reshapes below only split or
        # merge sublane dims (lane dim untouched), which Mosaic supports.
        lines = scratch[:].reshape(_TILE_B, T, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (_TILE_B, T, 128), 2)
        sel = (lane // E) == slot_ref[:][:, :, None]
        picked = jnp.where(sel, lines, jnp.zeros_like(lines))
        flat = picked.reshape(_TILE_B * T, 128).astype(jnp.float32)
        src = jax.lax.broadcasted_iota(jnp.int32, (128, E), 0)
        dst = jax.lax.broadcasted_iota(jnp.int32, (128, E), 1)
        fold = (src % E == dst).astype(jnp.float32)
        rows = jax.lax.dot_general(
            flat, fold, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # HIGHEST: the MXU's default bf16 pass would round the row
            # values this permutation matmul merely moves between lanes
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(_TILE_B, T, E).astype(scratch.dtype)
    m = mask_ref[:][:, :, None]  # (TILE_B, T, 1)
    if combiner == "max":
        out_ref[:] = jnp.max(jnp.where(m > 0, rows, -1e9), axis=1)
    else:
        out_ref[:] = jnp.sum(rows * m, axis=1)


def _gather_pool_fwd_pallas(table, ids, mask, combiner, interpret):
    B, T = ids.shape
    V, E = table.shape
    if T > _MAX_T:  # VMEM/semaphore budget (see fused_pool_supported)
        return reference_gather_pool(table, ids, mask, combiner)
    if E % 128 == 0:
        # E > 128: each row is m consecutive lines — handled by splitting
        # the feature dim into m independent 128-wide pools
        if E > 128:
            m = E // 128
            parts = [
                _gather_pool_fwd_pallas(
                    table[:, i * 128:(i + 1) * 128], ids, mask, combiner,
                    interpret)
                for i in range(m)
            ]
            return jnp.concatenate(parts, axis=1)
        k = 1
        lines = table
        lines_E = 128
    else:
        if not (128 % E == 0 and (V * E) % 128 == 0):
            return reference_gather_pool(table, ids, mask, combiner)
        k = 128 // E
        lines = table.reshape(V * E // 128, 128)
        lines_E = 128
    Vl = lines.shape[0]

    pad_b = (-B) % _TILE_B
    maskf = mask.astype(jnp.float32).reshape(B, T)
    ids_c = jnp.clip(ids.astype(jnp.int32), 0, V - 1)  # clip parity
    if pad_b:
        ids_c = jnp.concatenate([ids_c, jnp.zeros((pad_b, T), jnp.int32)], axis=0)
        maskf = jnp.concatenate([maskf, jnp.zeros((pad_b, T), jnp.float32)], axis=0)
    Bp = B + pad_b
    line_ids = ids_c // k if k > 1 else ids_c
    slots = (ids_c % k) if k > 1 else jnp.zeros_like(ids_c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Bp // _TILE_B,),
        in_specs=[
            # per-tile line-id block in SMEM: scalars drive DMA addressing
            pl.BlockSpec((_TILE_B, T), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE_B, T), lambda b: (b, 0)),  # slots (VMEM)
            pl.BlockSpec((_TILE_B, T), lambda b: (b, 0)),  # mask tile (VMEM)
            pl.BlockSpec(memory_space=pl.ANY),  # table lines stay in HBM
        ],
        out_specs=pl.BlockSpec((_TILE_B, E if k > 1 else lines_E),
                               lambda b: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((_TILE_B * T, 128), table.dtype),
            pltpu.SemaphoreType.DMA((_TILE_B * T,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_pool_kernel, T=T, k=k,
                          E=E if k > 1 else lines_E, combiner=combiner),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, E if k > 1 else lines_E),
                                       table.dtype),
        interpret=interpret,
    )(line_ids, slots, maskf, lines)
    out = out[:B, :E]

    if combiner == "mean":
        denom = jnp.sum(mask.astype(jnp.float32).reshape(B, T), axis=1,
                        keepdims=True) + 1e-8
        out = out / denom
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_gather_pool(table, ids, mask, combiner="sum", interpret=False):
    """(V,E) table, (B,T) ids, (B,T) mask -> pooled (B,E)."""
    return _gather_pool_fwd_pallas(table, ids, mask, combiner, interpret)


def _fwd(table, ids, mask, combiner, interpret):
    out = _gather_pool_fwd_pallas(table, ids, mask, combiner, interpret)
    return out, (table, ids, mask, out)


def _bwd(combiner, interpret, res, g):
    table, ids, mask, out = res
    B, T = ids.shape
    ids = jnp.clip(ids.astype(jnp.int32), 0, table.shape[0] - 1)  # clip parity
    maskf = mask.astype(jnp.float32)
    if combiner == "mean":
        denom = jnp.sum(maskf, axis=1, keepdims=True) + 1e-8
        per_step = (g / denom)[:, None, :] * maskf[:, :, None]  # (B,T,E)
    elif combiner == "sum":
        per_step = g[:, None, :] * maskf[:, :, None]
    else:  # max: route gradient to the argmax rows
        rows = jnp.take(table, ids.astype(jnp.int32), axis=0, mode="clip")
        masked = jnp.where(maskf[:, :, None] > 0, rows, -1e9)
        is_max = (masked == out[:, None, :]).astype(g.dtype)
        # split ties evenly, matching jnp.max's subgradient convention closely
        counts = jnp.sum(is_max, axis=1, keepdims=True)
        per_step = g[:, None, :] * is_max / jnp.maximum(counts, 1.0)
    d_table = jnp.zeros_like(table).at[ids.reshape(-1)].add(
        per_step.reshape(B * T, -1)
    )
    return d_table, None, None


fused_gather_pool.defvjp(_fwd, _bwd)


def reference_gather_pool(table, ids, mask, combiner="sum"):
    """Plain-XLA equivalent (gather then masked reduce) for testing/bench."""
    rows = jnp.take(table, ids.astype(jnp.int32), axis=0, mode="clip")
    m = mask.astype(jnp.float32)[:, :, None]
    if combiner == "max":
        return jnp.max(rows - (1.0 - m) * 1e9, axis=1)
    s = jnp.sum(rows * m, axis=1)
    if combiner == "mean":
        s = s / (jnp.sum(mask.astype(jnp.float32), axis=1, keepdims=True) + 1e-8)
    return s
