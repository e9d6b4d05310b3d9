"""Blocked lane-major attention kernel for MEDIUM-T transformers (Pallas).

Round-5 found two regimes for tiny-head attention (BASELINE.md):
- T <= 16 (DSIN sessions): the pure-XLA lane-major path wins 3.49x —
  unrolled accumulation chains fuse.
- T ~ 50 (BST): the same layout loses 0.55x — the T_k-term accumulation
  over ~105 MB f32 tensors exceeds XLA's fusion budget, so every add
  round-trips the accumulator through HBM (tools/probe_bst_parts.py:
  BST's one T=50 transformer is 23.2 ms of its 45 ms step).

This kernel is that layout with the fusion problem removed: per
(head, batch-block) grid step, Q/K/V blocks live in VMEM as
(D, T, B_blk) arrays — batch on the lanes, the tiny D/T axes on cheap
major dims — and the score/softmax/weighted-sum chain runs entirely in
VMEM. The T_k accumulation that XLA spilled becomes a register-resident
loop. The custom VJP recomputes the attention weights from Q/K (flash-
attention-style) so no (T_q, T_k, B) tensor ever exists in HBM in either
direction.

Semantics: the Transformer scaled-dot branch (key-mask to mask_padding,
optional blinding diagonal, f32 softmax, query-mask row zeroing). Routed
by layers/sequence.py for 16 < T <= 64 when attention-weight dropout is
inactive (falls back to the einsum path when dropout fires).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_STATE = {"enabled": None, "interpret": False}


def set_block_attention(enabled, interpret: bool = False):
    """True/False forces; None restores auto (TPU backend on)."""
    _STATE["enabled"] = enabled
    _STATE["interpret"] = bool(interpret)


def block_attention_enabled():
    if _STATE["enabled"] is not None:
        return bool(_STATE["enabled"])
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def block_attention_interpret():
    return _STATE["interpret"]


_VMEM_BUDGET = 13 * 2 ** 20  # Mosaic's scoped-vmem stack is 16 MB; leave slack


def _blk_bytes(T, D, Bb, itemsize, backward):
    """Rough live-set estimate per grid step (measured calibration: the
    fwd at T=50, D=16, Bb=512, bf16 compiled to 18.19 MB — scores/e and
    the out accumulator live in f32 regardless of input dtype)."""
    qkv = 3 * D * T * Bb * itemsize
    scores = 2 * T * T * Bb * 4          # scores + exp/soft live ranges
    out = D * T * Bb * 4
    masks = 2 * T * Bb * 4
    base = qkv + scores + out + masks
    if backward:
        base += D * T * Bb * itemsize    # dout block
        base += 2 * T * T * Bb * 4       # dw + ds
        base += 2 * D * T * Bb * 4       # two more (D,T,Bb) accumulators
    return base


def _pick_blk(B, T=None, D=None, itemsize=4, backward=False):
    for blk in (512, 256, 128):
        if B % blk != 0:
            continue
        if T is None or _blk_bytes(T, D, blk, itemsize,
                                   backward) <= _VMEM_BUDGET:
            return blk
    return None


def block_attention_supported(T_q, T_k, D, B):
    """Medium-T tier: above the XLA lane path's fusion range, below the
    VMEM budget ((D, T, blk) operands + (T, T, blk) f32 score block)."""
    return (16 < max(T_q, T_k) <= 64 and T_q == T_k and D <= 32
            and _pick_blk(B, T_q, D, 4, True) is not None)


def _att_block(q, k, km, qm, scale, blinding, mask_padding):
    """(D, T_q, Bb), (D, T_k, Bb), masks (T, Bb) -> weights (T_q,T_k,Bb).

    Shared by forward and backward (recompute)."""
    D, T_q, Bb = q.shape
    T_k = k.shape[1]
    scores = jnp.zeros((T_q, T_k, Bb), jnp.float32)
    for d in range(D):
        scores = scores + (q[d][:, None, :].astype(jnp.float32)
                           * k[d][None, :, :].astype(jnp.float32))
    scores = scores * scale
    scores = jnp.where(km[None, :, :] > 0, scores, mask_padding)
    if blinding:
        eye = (jax.lax.broadcasted_iota(jnp.int32, (T_q, T_k), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (T_q, T_k), 1))
        scores = jnp.where(eye[:, :, None], mask_padding, scores)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    soft = e / s
    return soft * qm[:, None, :].astype(jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, km_ref, qm_ref, o_ref,
                *, scale, blinding, mask_padding):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    w = _att_block(q, k, km_ref[:, :], qm_ref[:, :], scale, blinding,
                   mask_padding)
    D, T_q, Bb = q.shape
    T_k = k.shape[1]
    out = jnp.zeros((D, T_q, Bb), jnp.float32)
    for kk in range(T_k):
        out = out + (v[:, kk, :][:, None, :].astype(jnp.float32)
                     * w[:, kk, :][None, :, :])
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, km_ref, qm_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, blinding, mask_padding):
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    km, qm = km_ref[:, :], qm_ref[:, :]
    w = _att_block(q, k, km, qm, scale, blinding, mask_padding)
    D, T_q, Bb = q.shape
    T_k = k.shape[1]
    # dL/dweights[q,k,B] = sum_d V[d,k,B] * dout[d,q,B]
    dw = jnp.zeros((T_q, T_k, Bb), jnp.float32)
    for d in range(D):
        dw = dw + (do[d][:, None, :].astype(jnp.float32)
                   * v[d][None, :, :].astype(jnp.float32))
    # weights = soft * qmask -> dsoft = dw * qmask; softmax backward
    # (masked-out keys have soft == 0, so their ds vanishes automatically)
    qmf = qm[:, None, :].astype(jnp.float32)
    soft = jnp.where(qmf > 0, w / jnp.where(qmf > 0, qmf, 1.0), w)
    dsoft = dw * qmf
    inner = jnp.sum(soft * dsoft, axis=1, keepdims=True)
    ds = soft * (dsoft - inner) * scale
    # the einsum path's where(mask, scores, PAD) VJP zeroes score grads at
    # masked positions; normally soft==0 there already, but a FULLY-masked
    # row (e.g. length-1 + blinding) softmaxes uniform — re-apply the mask
    ds = ds * (km[None, :, :] > 0).astype(jnp.float32)
    if blinding:
        eye = (jax.lax.broadcasted_iota(jnp.int32, (T_q, T_k), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (T_q, T_k), 1))
        ds = jnp.where(eye[:, :, None], 0.0, ds)
    dq = jnp.zeros((D, T_q, Bb), jnp.float32)
    dk = jnp.zeros((D, T_k, Bb), jnp.float32)
    dv = jnp.zeros((D, T_k, Bb), jnp.float32)
    for kk in range(T_k):
        dq = dq + (k[:, kk, :][:, None, :].astype(jnp.float32)
                   * ds[:, kk, :][None, :, :])
    for qq in range(T_q):
        dk = dk + (q[:, qq, :][:, None, :].astype(jnp.float32)
                   * ds[qq, :, :][None, :, :])
        dv = dv + (do[:, qq, :][:, None, :].astype(jnp.float32)
                   * w[qq, :, :][None, :, :])
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(H, D, T, Bb, n_masks=2):
    qkv = pl.BlockSpec((1, D, T, Bb), lambda h, b: (h, 0, 0, b))
    mask = pl.BlockSpec((T, Bb), lambda h, b: (0, b))
    return qkv, mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def block_attention(Q, K, V, k_mask, q_mask, scale, blinding,
                    mask_padding, interpret=False):
    """Lane-major attention core: (H, D, T, B) Q/K/V + (T, B) masks ->
    (H, D, T_q, B) weighted values. Weights never exist in HBM."""
    return _block_fwd_call(Q, K, V, k_mask, q_mask, scale, blinding,
                           mask_padding, interpret)


def _block_fwd_call(Q, K, V, k_mask, q_mask, scale, blinding,
                    mask_padding, interpret):
    H, D, T_q, B = Q.shape
    T_k = K.shape[2]
    Bb = _pick_blk(B, max(T_q, T_k), D, Q.dtype.itemsize, False)
    qkv, mask = _specs(H, D, T_q, Bb)
    kv_spec = pl.BlockSpec((1, D, T_k, Bb), lambda h, b: (h, 0, 0, b))
    km_spec = pl.BlockSpec((T_k, Bb), lambda h, b: (0, b))
    kern = functools.partial(_fwd_kernel, scale=scale, blinding=blinding,
                             mask_padding=mask_padding)
    return pl.pallas_call(
        kern,
        grid=(H, B // Bb),
        in_specs=[qkv, kv_spec, kv_spec, km_spec, mask],
        out_specs=qkv,
        out_shape=jax.ShapeDtypeStruct((H, D, T_q, B), Q.dtype),
        interpret=interpret,
    )(Q, K, V, k_mask, q_mask)


def _fwd(Q, K, V, k_mask, q_mask, scale, blinding, mask_padding,
         interpret):
    out = _block_fwd_call(Q, K, V, k_mask, q_mask, scale, blinding,
                          mask_padding, interpret)
    return out, (Q, K, V, k_mask, q_mask)


def _bwd(scale, blinding, mask_padding, interpret, res, dout):
    Q, K, V, k_mask, q_mask = res
    H, D, T_q, B = Q.shape
    T_k = K.shape[2]
    Bb = _pick_blk(B, max(T_q, T_k), D, Q.dtype.itemsize, True)
    qkv, mask = _specs(H, D, T_q, Bb)
    kv_spec = pl.BlockSpec((1, D, T_k, Bb), lambda h, b: (h, 0, 0, b))
    km_spec = pl.BlockSpec((T_k, Bb), lambda h, b: (0, b))
    kern = functools.partial(_bwd_kernel, scale=scale, blinding=blinding,
                             mask_padding=mask_padding)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(H, B // Bb),
        in_specs=[qkv, kv_spec, kv_spec, km_spec, mask, qkv],
        out_specs=[qkv, kv_spec, kv_spec],
        out_shape=[jax.ShapeDtypeStruct((H, D, T_q, B), Q.dtype),
                   jax.ShapeDtypeStruct((H, D, T_k, B), K.dtype),
                   jax.ShapeDtypeStruct((H, D, T_k, B), V.dtype)],
        interpret=interpret,
    )(Q, K, V, k_mask, q_mask, dout)
    return dq, dk, dv, None, None


block_attention.defvjp(_fwd, _bwd)


def transformer_block_attention(queries, keys, W_q, W_k, W_v, q_mask,
                                k_mask, D, H, mask_padding, blinding,
                                compute_dtype=jnp.float32,
                                interpret=False, scale=None):
    """Transformer front-end for the kernel: lane-major projections in
    XLA (efficient dot_generals), the attention core in Pallas, heads
    merged on exit. Mirrors attention_lanes.lane_attention's contract:
    returns (B, T_q, H*D)."""
    B, T_q, E = queries.shape
    T_k = keys.shape[1]
    cd = compute_dtype
    qt = jnp.transpose(queries.astype(cd), (1, 2, 0))
    kt = jnp.transpose(keys.astype(cd), (1, 2, 0))

    def proj(xt, W, T):
        out = jax.lax.dot_general(
            W.astype(cd).T, xt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out.astype(cd).reshape(H, D, T, B)

    Q = proj(qt, W_q, T_q)
    K = proj(kt, W_k, T_k)
    V = proj(kt, W_v, T_k)
    km = jnp.transpose(k_mask, (1, 0)).astype(jnp.float32)  # (T_k, B)
    qm = jnp.transpose(q_mask, (1, 0)).astype(jnp.float32)  # (T_q, B)
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    out = block_attention(Q, K, V, km, qm, scale, blinding,
                          float(mask_padding), interpret)
    return jnp.transpose(out.astype(cd), (3, 2, 0, 1)).reshape(
        B, T_q, H * D)
