"""Small-vocab embedding gather/scatter as VMEM-resident one-hot matmuls.

Physics (round-5 sequence-tier decomposition, BASELINE.md): sequence
models are AT their no-overlap random-row bound — DIN spends 93% of its
step on HBM row service at ~15 ns/row, and the bill is per-id regardless
of how few DISTINCT rows the ids touch (round-3: 1k-distinct vs
200k-distinct is the same cost; XLA's TPU gather issues one row DMA per
id even when the whole table is 64 KB). Half a DIN example's ids hit the
1k-row cate table.

This kernel removes those rows from the HBM bill entirely: the table
lives in VMEM for the whole kernel, each id block builds a one-hot
(block, V) matrix in registers (broadcasted-iota compare — never touches
HBM), and the MXU contracts it with the table:

    forward:   rows  = one_hot(ids) @ table          (B_blk, V) x (V, E)
    backward:  dtable = sum_blocks one_hot(ids)^T @ dout, accumulated in
               a VMEM f32 scratch across grid steps, written once.

The backward also kills the per-row scatter-add (the other half of the
2x per-id bill) AND upgrades bf16-table gradient accumulation to f32.

MXU cost for 400k ids x V=1024 x E=32 is ~27 MFLOP-equivalent per block
chain — microseconds — vs ~6 ms of row DMAs it replaces.

Routing: ``parallel.sharded_lookup.routed_take`` calls ``maybe_mxu_gather``
for un-sharded tables; eligibility is V <= MAX_VOCAB (VMEM budget) on the
TPU backend (or interpret mode for CPU tests). ``set_small_vocab(False)``
opts out; serving export disables it like the other fused funnels
(a tpu_custom_call would pin the artifact to one platform).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# table rows above this don't fit the VMEM-resident design budget
# ((V, E<=128pad) table + (BLK, V) one-hot + accumulators inside ~16 MB)
MAX_VOCAB = 4096
MAX_WIDTH = 256
BLK = 512  # ids per grid step
# below this many ids per call the pallas fixed costs beat the row-DMA
# savings: the round-5 A/B measured DIN/DIEN/BST (409.6k-id history
# gathers) +4..6% but DSIN (ten separate 81.9k-id session gathers) -29%
MIN_IDS = 131072

_STATE = {"enabled": None, "interpret": False}  # None = auto (TPU on)


def set_small_vocab(enabled, interpret: bool = False):
    """True/False forces; None restores auto (on for TPU backend)."""
    _STATE["enabled"] = enabled
    _STATE["interpret"] = bool(interpret)


def small_vocab_enabled():
    if _STATE["enabled"] is not None:
        return bool(_STATE["enabled"])
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def small_vocab_interpret():
    return _STATE["interpret"]


def small_vocab_supported(V, E):
    return V <= MAX_VOCAB and E <= MAX_WIDTH


def _pad_up(n, m):
    return -(-n // m) * m


def _fwd_kernel(ids_ref, table_ref, out_ref):
    B, _ = ids_ref.shape
    Vp = table_ref.shape[0]
    iot = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
    oh = (iot == ids_ref[:, 0:1]).astype(table_ref.dtype)
    out_ref[:, :] = jnp.dot(
        oh, table_ref[:, :], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _bwd_kernel(ids_ref, g_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    B, _ = ids_ref.shape
    Vp = acc_ref.shape[0]
    iot = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
    oh = (iot == ids_ref[:, 0:1]).astype(jnp.float32)
    # contract over the block axis: (V, B) x (B, E) via dot_general
    acc_ref[:, :] += jax.lax.dot_general(
        oh, g_ref[:, :].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _prep_ids(ids, V):
    """clip (jnp.take mode='clip' parity), flatten, pad to BLK multiple.

    Padding uses id = -1: matches NO one-hot column, so padded slots
    gather zero rows forward and contribute nothing backward."""
    flat = jnp.clip(ids.reshape(-1).astype(jnp.int32), 0, V - 1)
    N = flat.shape[0]
    Np = _pad_up(max(N, 1), BLK)
    if Np != N:
        flat = jnp.concatenate(
            [flat, jnp.full((Np - N,), -1, jnp.int32)])
    return flat.reshape(Np, 1), N, Np


def _gather_pallas(table, ids, interpret):
    V, E = table.shape
    Vp = _pad_up(V, 128)
    if Vp != V:
        table = jnp.pad(table, ((0, Vp - V), (0, 0)))
    ids2, N, Np = _prep_ids(ids, V)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(Np // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0)),
            pl.BlockSpec((Vp, E), lambda i: (0, 0)),  # VMEM-resident
        ],
        out_specs=pl.BlockSpec((BLK, E), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, E), table.dtype),
        interpret=interpret,
    )(ids2, table)
    return out[:N].reshape(ids.shape + (E,))


def _scatter_pallas(g, ids, V, E, out_dtype, interpret):
    Vp = _pad_up(V, 128)
    ids2, N, Np = _prep_ids(ids, V)
    g_flat = g.reshape(N, E)
    if Np != N:
        g_flat = jnp.concatenate(
            [g_flat, jnp.zeros((Np - N, E), g_flat.dtype)])
    acc = pl.pallas_call(
        _bwd_kernel,
        grid=(Np // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0)),
            pl.BlockSpec((BLK, E), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((Vp, E), lambda i: (0, 0)),  # accumulates
        out_shape=jax.ShapeDtypeStruct((Vp, E), jnp.float32),
        interpret=interpret,
    )(ids2, g_flat)
    return acc[:V].astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mxu_gather(table, ids, interpret=False):
    """jnp.take(table, ids, axis=0, mode='clip') with VMEM/MXU physics.

    Forward rows identical to take (one-hot selects exact table values);
    backward is a dense f32 MXU accumulation instead of per-row
    scatter-adds (sum order differs from XLA's scatter at f32 ULP level).
    """
    return _gather_pallas(table, ids, interpret)


def _mxu_fwd(table, ids, interpret):
    # residuals hold the table array itself only for its shape/dtype —
    # it's a live parameter either way, so this costs no extra memory
    return _gather_pallas(table, ids, interpret), (table, ids)


def _mxu_bwd(interpret, res, g):
    table, ids = res
    V, E = table.shape
    return _scatter_pallas(g, ids, V, E, table.dtype, interpret), None


mxu_gather.defvjp(_mxu_fwd, _mxu_bwd)


def maybe_mxu_gather(table, ids):
    """The routing hook for the lookup funnel: returns MXU-gathered rows
    when the kernel applies here, else None (caller falls back to take)."""
    if not small_vocab_enabled():
        return None
    V, E = table.shape
    if not small_vocab_supported(V, E):
        return None
    if getattr(ids, "ndim", None) is None:
        return None
    if not small_vocab_interpret() and int(np.prod(ids.shape)) < MIN_IDS:
        return None  # interpret mode (CPU tests) exercises every shape
    return mxu_gather(table, ids, small_vocab_interpret())
