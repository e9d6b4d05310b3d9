"""Pallas TPU kernel: fused short-sequence multi-head attention.

CTR attention is over SHORT axes — behavior histories (BST/DSIN
Transformer, T<=50, reference layers/sequence.py:431-651) and feature
fields (AutoInt InteractingLayer, F~30, reference interaction.py:697-790)
— but at large batch, so XLA's lowering materializes the (B, H, T, T)
score/weight tensors in HBM several times per step (fwd + saved-for-bwd +
softmax VJP): at BST shape that is ~650 MB per pass and measured
12-14 ms per block fwd+bwd, the single largest cost in the model.

This kernel exploits the short-T regime: whole score tiles live in VMEM,
so HBM sees only Q, K, V in and O out; the backward recomputes the
weights from Q/K in VMEM instead of saving them (the flash-attention
trick, trivial here since T*T fits on-chip).

The formulation is chosen for the MXU (probed on v5e):
- per-head (T, D) x (D, T) matmuls are tiny (T<=56, D=8..16): a fori_loop
  over heads is 15x SLOWER than XLA (issue overhead), and a batched
  dot_general over a G-head block only reaches ~parity with XLA — tens of
  thousands of tiny MXU issues dominate either way.
- instead, G heads are FLATTENED to one (G*T, D) tile and ONE matmul
  computes the full (G*T, G*T) cross-head score matrix; the off-block
  (cross-head) entries are masked to a sentinel STRICTLY below the real
  mask level, so softmax confines each row to its own head's T keys.
  G-fold FLOP/VPU waste is the price of turning 2*G tiny matmuls into
  2 big ones (hardware A/B vs XLA: tools/bench_attention.py).
- reshapes only merge/split SUBLANE dims ((G,T,D) <-> (G*T,D)); the lane
  dim is never reshaped (Mosaic cannot lower lane-splitting casts).
- matmul precision is DEFAULT (one bf16 MXU pass), exactly like the
  layer einsums this kernel replaces.

Masking levels inside a row of the (G*T, G*T) score matrix:
  own-block, valid key     -> score
  own-block, masked key    -> -2^32+1   (MASK_PADDING, matches the funnel)
  own-block, blinded diag  -> -2^32+1
  cross-block or T-padding -> -3e38     (strictly lower: on a FULLY masked
     row — length-1 history + blinding — softmax degenerates to uniform
     over the top level, which must be the real T keys only, exactly as
     the unpadded XLA path behaves)

Query masking / residual stay OUTSIDE the kernel (query-mask zeroing of
W rows == zeroing O rows, applied by the caller). Attention-weight
dropout runs IN-KERNEL: a counter-based hash of (seed, position) builds
the keep mask in VMEM — fwd and bwd replay it identically, and the
(B,H,T,T) mask never exists in HBM (the XLA path materializes it).

Integration: ``set_fused_attention(True)`` (or
``CTRModel.compile(..., fused_attention=True)``) routes
``layers.sequence.Transformer`` (scaled_dot_product) and
``layers.interaction.InteractingLayer`` through this kernel.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG = -(2.0 ** 32) + 1.0  # layers.base.MASK_PADDING
_PAD_NEG = -3.0e38         # strictly below _NEG; see module docstring
# match the funnel einsums: default MXU precision (bf16 passes)
_MM = jax.lax.Precision.DEFAULT

# heads per grid step: VPU softmax waste grows with G (the (G*T, G*T)
# tile is G-fold larger than needed) while MXU/grid overhead shrinks
_G_FWD = 16
_G_BWD = 16
# the bwd kernel holds ~6 (G*T, G*T) f32 tiles live; cap one tile at 4 MB
# (~24 MB live, well under v5e's 128 MB VMEM) so an oversized T falls
# back to XLA instead of dying in Mosaic with a VMEM-exceeded error.
# At G=16 this accepts T<=64 (covers BST/DSIN/AutoInt shapes) and
# rejects e.g. T=128.
_MAX_TILE_BYTES = 4 * 1024 * 1024


def fused_attention_supported(T: int, D: int) -> bool:
    """Shapes the VMEM-resident kernel handles; others use the XLA path."""
    Tp = T + ((-T) % 8)
    n = max(_G_FWD, _G_BWD) * Tp
    return n * n * 4 <= _MAX_TILE_BYTES


# process-wide funnel switch (same pattern as ops.embedding)
_FUSED_ATTN = {"enabled": False, "interpret": False}


def set_fused_attention(enabled: bool, interpret: bool = False):
    """Enable/disable the fused attention path inside the layer zoo."""
    _FUSED_ATTN["enabled"] = bool(enabled)
    _FUSED_ATTN["interpret"] = bool(interpret)


def fused_attention_enabled():
    return _FUSED_ATTN["enabled"]


def fused_attention_interpret():
    return _FUSED_ATTN["interpret"]


def _score_mask(km_row, *, G, T, blinding):
    """(G*T, G*T) selects: (in-block valid, in-block masked-or-blinded)."""
    N = G * T
    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    block = (row // T) == (col // T)
    valid = block & (km_row > 0)  # km_row broadcasts (1, N) down rows
    if blinding:
        valid = valid & (row != col)
    return valid, block


def _weights(qc, kc, km_row, *, G, T, scale, blinding):
    """(G*T, G*T) softmax weights in f32, recomputed identically fwd/bwd."""
    s = jax.lax.dot_general(
        qc, kc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_MM) * scale
    valid, block = _score_mask(km_row, G=G, T=T, blinding=blinding)
    s = jnp.where(valid, s, jnp.where(block & (km_row >= 0), _NEG, _PAD_NEG))
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    return w, valid


def _keep_mask(seed, gid, N, rate):
    """Deterministic per-position dropout keep mask in f32.

    Counter-based: position index mixed with (seed, grid step) through a
    murmur3-style finalizer — identical in fwd and bwd by construction,
    and pure jnp integer ops so it lowers on Mosaic AND runs in interpret
    mode (pltpu.prng_* has no CPU interpret rule). int32 multiplies wrap
    two's-complement, matching uint32 bit patterns; the threshold compare
    uses the low 24 bits (non-negative) for unsigned semantics.
    """
    shr = jax.lax.shift_right_logical  # murmur needs LOGICAL shifts
    idx = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) * N
           + jax.lax.broadcasted_iota(jnp.int32, (N, N), 1))
    h = idx + seed * jnp.int32(-0x61C88647) + gid * jnp.int32(-0x7A143595)
    h = h ^ shr(h, 16)
    h = h * jnp.int32(-0x7A143595)  # 0x85EBCA6B as signed int32
    h = h ^ shr(h, 13)
    h = h * jnp.int32(-0x3D4D51CB)  # 0xC2B2AE35 as signed int32
    h = h ^ shr(h, 16)
    r24 = h & jnp.int32(0xFFFFFF)
    thresh = jnp.int32(int(rate * (1 << 24)))
    return (r24 >= thresh).astype(jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, km_ref, seed_ref, o_ref, *, G, T,
                scale, blinding, rate):
    D = q_ref.shape[-1]
    qc = q_ref[:].reshape(G * T, D).astype(jnp.float32)
    kc = k_ref[:].reshape(G * T, D).astype(jnp.float32)
    vc = v_ref[:].reshape(G * T, D).astype(jnp.float32)
    w, _ = _weights(qc, kc, km_ref[0], G=G, T=T, scale=scale,
                    blinding=blinding)
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0, 0].astype(jnp.int32),
                          pl.program_id(0), G * T, rate)
        w = w * keep * (1.0 / (1.0 - rate))
    o = jax.lax.dot_general(
        w, vc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_MM)
    o_ref[:] = o.reshape(G, T, D).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, km_ref, seed_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, G, T, scale, blinding, rate):
    D = q_ref.shape[-1]
    qc = q_ref[:].reshape(G * T, D).astype(jnp.float32)
    kc = k_ref[:].reshape(G * T, D).astype(jnp.float32)
    vc = v_ref[:].reshape(G * T, D).astype(jnp.float32)
    doc = do_ref[:].reshape(G * T, D).astype(jnp.float32)
    w, valid = _weights(qc, kc, km_ref[0], G=G, T=T, scale=scale,
                        blinding=blinding)
    if rate > 0.0:
        # identical keep mask to the forward pass (same seed + grid step)
        keep = _keep_mask(seed_ref[0, 0].astype(jnp.int32),
                          pl.program_id(0), G * T, rate)
        wd = w * keep * (1.0 / (1.0 - rate))
    else:
        keep = None
        wd = w
    # dV[c,:] = sum_r Wd[r,c] dO[r,:]   (off-block W is exactly 0)
    dv = jax.lax.dot_general(
        wd, doc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_MM)
    # dWd[r,c] = dO[r,:] . V[c,:]  (off-block values garbage, killed below)
    dw = jax.lax.dot_general(
        doc, vc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_MM)
    if keep is not None:
        # chain rule through the dropout scaling: dL/dW = dL/dWd * keep/(1-p)
        dw = dw * keep * (1.0 / (1.0 - rate))
    # softmax VJP, then the explicit mask: on a FULLY-masked row softmax
    # degenerates to uniform (W != 0 at masked keys), and the XLA path's
    # where() blocks those gradients — so must the kernel.
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True)) * scale
    ds = jnp.where(valid, ds, 0.0)
    # dQ[r,:] = sum_c dS[r,c] K[c,:]
    dq = jax.lax.dot_general(
        ds, kc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_MM)
    # dK[c,:] = sum_r dS[r,c] Q[r,:]
    dk = jax.lax.dot_general(
        ds, qc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_MM)
    dq_ref[:] = dq.reshape(G, T, D).astype(dq_ref.dtype)
    dk_ref[:] = dk.reshape(G, T, D).astype(dk_ref.dtype)
    dv_ref[:] = dv.reshape(G, T, D).astype(dv_ref.dtype)


def _pad_to(x, n, axis):
    pad = (-x.shape[axis]) % n
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _qkv_specs(G, T, D):
    return [
        pl.BlockSpec((G, T, D), lambda i: (i, 0, 0)),  # Q
        pl.BlockSpec((G, T, D), lambda i: (i, 0, 0)),  # K
        pl.BlockSpec((G, T, D), lambda i: (i, 0, 0)),  # V
        # (1, 1, GT) block: last two dims must equal the array's
        pl.BlockSpec((1, 1, G * T), lambda i: (i, 0, 0)),  # key-mask row
        pl.BlockSpec((1, 1), lambda i: (0, 0)),  # dropout seed scalar
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _attn_core(q, k, v, kmask, seed, scale, blinding, rate, interpret):
    return _attn_fwd_call(q, k, v, kmask, seed, scale, blinding, rate,
                          interpret)


def _attn_fwd_call(q, k, v, kmask, seed, scale, blinding, rate, interpret):
    BH, T, D = q.shape
    G = _G_FWD
    km_rows = kmask.reshape(BH // G, 1, G * T)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, G=G, T=T, scale=scale,
                          blinding=blinding, rate=rate),
        grid=(BH // G,),
        in_specs=_qkv_specs(G, T, D),
        out_specs=pl.BlockSpec((G, T, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, T, D), q.dtype),
        interpret=interpret,
    )(q, k, v, km_rows, seed)
    return out


def _attn_fwd(q, k, v, kmask, seed, scale, blinding, rate, interpret):
    out = _attn_fwd_call(q, k, v, kmask, seed, scale, blinding, rate,
                         interpret)
    return out, (q, k, v, kmask, seed)


def _attn_bwd(scale, blinding, rate, interpret, res, do):
    q, k, v, kmask, seed = res
    BH, T, D = q.shape
    G = _G_BWD
    km_rows = kmask.reshape(BH // G, 1, G * T)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, G=G, T=T, scale=scale,
                          blinding=blinding, rate=rate),
        grid=(BH // G,),
        in_specs=_qkv_specs(G, T, D) + [
            pl.BlockSpec((G, T, D), lambda i: (i, 0, 0)),  # dO
        ],
        out_specs=[
            pl.BlockSpec((G, T, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, T, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, T, D), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), q.dtype),
            jax.ShapeDtypeStruct((BH, T, D), k.dtype),
            jax.ShapeDtypeStruct((BH, T, D), v.dtype),
        ],
        interpret=interpret,
    )(q, k, v, km_rows, seed, do)
    # key_mask/seed enter only through selects — zero cotangents
    return dq, dk, dv, jnp.zeros_like(kmask), jnp.zeros_like(seed)


_attn_core.defvjp(_attn_fwd, _attn_bwd)


def fused_attention(q, k, v, key_mask=None, scale=1.0, blinding=False,
                    dropout_rate=0.0, dropout_seed=None, interpret=False):
    """Fused multi-head attention for short sequences.

    q, k, v: (B, H, T, D); key_mask: (B, T) (1 = valid) or None.
    Returns softmax((q @ k^T) * scale [masked/blinded]) @ v, with
    optional attention-weight dropout (``dropout_rate`` > 0 requires
    ``dropout_seed``, a scalar; the keep mask is a counter-based hash of
    position and seed, replayed identically by the custom VJP — the mask
    never exists in HBM). Gradients flow to q, k, v; the (B,H,T,T)
    arrays never exist in HBM.
    """
    B, H, T, D = q.shape
    BH = B * H
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if not fused_attention_supported(T, D):
        # long-T shapes would exceed the kernel's VMEM tile budget —
        # serve them with the XLA path instead of failing to compile
        # (weight-level dropout, same semantics, mask in HBM)
        return reference_attention(
            q, k, v, key_mask, scale, blinding,
            dropout_rate=dropout_rate, dropout_seed=dropout_seed)

    qf = q.reshape(BH, T, D)
    kf = k.reshape(BH, T, D)
    vf = v.reshape(BH, T, D)
    if key_mask is not None:
        km = jnp.broadcast_to(
            key_mask.astype(jnp.float32)[:, None, :], (B, H, T)
        ).reshape(BH, T)
    else:
        km = jnp.ones((BH, T), jnp.float32)

    # static padding: T to sublane multiples, BH to the block size;
    # padded keys get the -1 sentinel (strictly below masked real keys).
    # lcm: BHp must divide by BOTH block sizes (fwd and bwd kernels)
    Tp = T + ((-T) % 8)
    G = math.lcm(_G_FWD, _G_BWD)
    BHp = BH + ((-BH) % G)
    if Tp != T:
        qf = _pad_to(qf, 8, 1)
        kf = _pad_to(kf, 8, 1)
        vf = _pad_to(vf, 8, 1)
        km = jnp.pad(km, ((0, 0), (0, Tp - T)), constant_values=-1.0)
    if BHp != BH:
        qf = _pad_to(qf, G, 0)
        kf = _pad_to(kf, G, 0)
        vf = _pad_to(vf, G, 0)
        km = jnp.pad(km, ((0, BHp - BH), (0, 0)), constant_values=-1.0)

    seed = jnp.zeros((1, 1), jnp.float32) if dropout_seed is None else \
        jnp.asarray(dropout_seed, jnp.float32).reshape(1, 1)
    out = _attn_core(qf, kf, vf, km, seed, float(scale), bool(blinding),
                     float(dropout_rate), bool(interpret))
    return out[:BH, :T, :].reshape(B, H, T, D)


def reference_attention(q, k, v, key_mask=None, scale=1.0, blinding=False,
                        dropout_rate=0.0, dropout_seed=None):
    """Plain-XLA equivalent for tests/benches (matches the funnel paths).

    Dropout here is weight-level (like the funnel's nn.Dropout on the
    attention weights) with a jax.random mask — used by the long-T
    fallback; the RNG stream differs from the kernel's counter hash.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :] > 0, s, _NEG)
    if blinding:
        T_q, T_k = s.shape[2], s.shape[3]
        s = jnp.where(jnp.eye(T_q, T_k, dtype=bool)[None, None], _NEG, s)
    s = s.astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    w = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        key = jax.random.fold_in(
            jax.random.PRNGKey(17),
            jnp.asarray(0 if dropout_seed is None else dropout_seed,
                        jnp.int32))
        keep = jax.random.uniform(key, w.shape) >= dropout_rate
        w = w * keep / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v)
