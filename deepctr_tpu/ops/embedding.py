"""Pallas TPU kernel: fused embedding gather + masked sequence pooling.

The hot op of every CTR model is the embedding path (SURVEY §2.1/§7): for a
varlen feature the reference materializes the gathered (B, T, E) sequence in
HBM and then reduces it (two passes). This kernel fuses both: rows stream
from the HBM table straight into a VMEM accumulator — the (B, T, E)
intermediate never exists.

Mechanics (the canonical scalar-prefetch gather pattern):
- ids (B*T,) arrive as a scalar-prefetch operand, so the table BlockSpec's
  index_map can address row ``ids[b*T + t]`` while the grid walks (b, t).
- the output block is revisited for all t of one b; a @pl.when t==0 arm
  initializes the accumulator, later steps accumulate the masked row.
- combiner sum/mean/max matches sequence_pooling (layers/sequence.py:44-61).

``fused_gather_pool`` wraps the kernel in a custom_vjp whose backward
scatter-adds pooled cotangents into the table, so it is a drop-in training
op. Use ``interpret=True`` on CPU (tests) — compiled mode on TPU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_TILE_B = 8  # sublane granularity for the output tile


def _pool_kernel(ids_ref, mask_ref, table_ref, out_ref, scratch, sems, *,
                 T, combiner):
    # ids_ref is this tile's (TILE_B, T) id block in SMEM — scalar reads
    # from it drive the per-row DMA addressing.
    def row_dma(k):
        row_id = ids_ref[k // T, k % T]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row_id, 1), :],
            scratch.at[pl.ds(k, 1), :],
            sems.at[k],
        )

    def start_dma(k, _):
        row_dma(k).start()
        return 0

    jax.lax.fori_loop(0, _TILE_B * T, start_dma, 0)

    def wait_dma(k, _):
        row_dma(k).wait()
        return 0

    jax.lax.fori_loop(0, _TILE_B * T, wait_dma, 0)

    rows = scratch[:].reshape(_TILE_B, T, -1)
    m = mask_ref[:][:, :, None]  # (TILE_B, T, 1)
    if combiner == "max":
        out_ref[:] = jnp.max(jnp.where(m > 0, rows, -1e9), axis=1)
    else:
        out_ref[:] = jnp.sum(rows * m, axis=1)


def _gather_pool_fwd_pallas(table, ids, mask, combiner, interpret):
    B, T = ids.shape
    V, E_in = table.shape
    # Mosaic DMA slices must be 128-lane aligned: pad the embedding dim.
    # (For E >= 128 multiples this is free; for small E prefer the XLA path.)
    pad_e = (-E_in) % 128 if not interpret else 0
    if pad_e:
        table = jnp.pad(table, ((0, 0), (0, pad_e)))
    E = E_in + pad_e
    pad_b = (-B) % _TILE_B
    maskf = mask.astype(jnp.float32).reshape(B, T)
    if pad_b:
        ids = jnp.concatenate([ids, jnp.zeros((pad_b, T), ids.dtype)], axis=0)
        maskf = jnp.concatenate([maskf, jnp.zeros((pad_b, T), jnp.float32)], axis=0)
    Bp = B + pad_b
    # mode="clip" parity with every other lookup path: OOV ids clamp
    # (also keeps the kernel's row DMAs in bounds)
    ids_i32 = jnp.clip(ids.astype(jnp.int32), 0, V - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Bp // _TILE_B,),
        in_specs=[
            # per-tile id block in SMEM: scalars drive DMA addressing
            pl.BlockSpec((_TILE_B, T), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE_B, T), lambda b: (b, 0)),  # mask tile (VMEM)
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec((_TILE_B, E), lambda b: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((_TILE_B * T, E), table.dtype),
            pltpu.SemaphoreType.DMA((_TILE_B * T,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_pool_kernel, T=T, combiner=combiner),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, E), table.dtype),
        interpret=interpret,
    )(ids_i32, maskf, table)
    out = out[:B, :E_in]

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
