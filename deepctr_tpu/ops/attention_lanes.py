"""Lane-major multi-head attention for TINY (T, head_dim) shapes.

Physics (round-5 DSIN ablation, BASELINE.md): DSIN is five T=10, dk=8,
H=8 transformers at ~14.9 ms each — 80% of its step. The standard
(B, H, T, dk) layout puts the two tiny axes on the TPU's tiled minors:
dk=8 pads to 128 lanes (16x) and T=10 to 16 sublanes (1.6x), so every
score/weight/projection tensor is ~26x its logical bytes and the chain
runs at ~1% utilization. (Both prior attacks failed for the same reason:
session-folding (r3, 0.90x) kept the layout; the fused Pallas attention
(r3, 0.54-0.77x) kept G-head blocks on the minors.)

This path plays the trick that made the GRU kernel 9.8-13x
(ops/gru.py): put the BATCH on the minor axis. All attention tensors
become (H, T, T, B) / (H, dk, T, B) — the huge axis fills the 128 lanes,
the tiny axes sit on cheap major dims. The score/weighted-sum
contractions over dk/T_k unroll into fused elementwise multiply-adds
(dk and T are static and tiny); projections stay MXU dot_generals with
the batch as the N dimension. Pure XLA — no Pallas — so it autodiffs,
exports under symbolic batch dims, and runs identically on CPU.

Semantics mirror layers/sequence.py Transformer's scaled_dot_product
branch bit-for-bit up to contraction order: same mask padding, blinding
diagonal, f32 max-subtracted softmax, query-mask row zeroing, dropout on
the attention weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_STATE = {"enabled": None}  # None = auto (on for TPU)


def set_lane_attention(enabled):
    """True/False forces; None restores auto (TPU backend on)."""
    _STATE["enabled"] = enabled


def lane_attention_enabled():
    if _STATE["enabled"] is not None:
        return bool(_STATE["enabled"])
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def lane_attention_supported(T_q, T_k, D):
    """Where the layout pays: TINY sequence axes. TPU A/B (BASELINE.md
    round 5): DSIN's T=10 sessions 3.49x (88.8k -> 310.1k ex/s, residual
    62.9 -> 0.3 ms); BST's T=50 0.55x — at T=50 the f32 (H,T,T,B) score
    tensor is ~1.3 GB/step and the unrolled T_k accumulation stops
    fusing, so the padded-einsum path wins back. Gate at T <= 16."""
    return T_q <= 16 and T_k <= 16 and D <= 32


def lane_attention(queries, keys, W_q, W_k, W_v, q_mask, k_mask, D, H,
                   mask_padding, blinding, dropout_rate=0.0,
                   dropout_rng=None, compute_dtype=jnp.float32):
    """Scaled-dot-product MHA in batch-on-lanes layout.

    queries (B, T_q, E), keys (B, T_k, E), weights (E, H*D),
    masks (B, T) floats. Returns (B, T_q, H*D) — heads already merged
    (the caller's post-attention tail consumes this directly; no
    (B, H, T, D) tensor ever exists).
    """
    B, T_q, E = queries.shape
    T_k = keys.shape[1]
    cd = compute_dtype

    # one entry transpose per operand: (T, E, B) — minor (E, B) is
    # lane-friendly; everything downstream stays batch-minor
    qt = jnp.transpose(queries.astype(cd), (1, 2, 0))
    kt = jnp.transpose(keys.astype(cd), (1, 2, 0))

    def proj(xt, W, T):
        # (H*D, T, B): contract E between W^T (HD, E) and xt (T, E, B)
        out = jax.lax.dot_general(
            W.astype(cd).T, xt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out.astype(cd).reshape(H, D, T, B)

    Q = proj(qt, W_q, T_q)
    K = proj(kt, W_k, T_k)
    V = proj(kt, W_v, T_k)

    # scores (H, T_q, T_k, B): unrolled fused multiply-adds over dk —
    # D is tiny and static, XLA fuses the chain into one loop
    scale = 1.0 / (D ** 0.5)
    scores = jnp.zeros((H, T_q, T_k, B), jnp.float32)
    for d in range(D):
        scores = scores + (Q[:, d, :, None, :].astype(jnp.float32)
                           * K[:, d, None, :, :].astype(jnp.float32))
    scores = scores * scale

    kt_mask = jnp.transpose(k_mask, (1, 0))[None, None, :, :] > 0
    scores = jnp.where(kt_mask, scores, mask_padding)
    if blinding:
        eye = jnp.eye(T_q, T_k, dtype=bool)[None, :, :, None]
        scores = jnp.where(eye, mask_padding, scores)

    scores = scores - jnp.max(scores, axis=2, keepdims=True)
    weights = jax.nn.softmax(scores, axis=2).astype(cd)
    qt_mask = jnp.transpose(q_mask, (1, 0))[None, :, None, :].astype(cd)
    weights = weights * qt_mask
    if dropout_rate and dropout_rng is not None:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate),
                            0.0).astype(cd)

    # weighted sum (H, D, T_q, B): unrolled over T_k
    out = jnp.zeros((H, D, T_q, B), jnp.float32)
    for k in range(T_k):
        out = out + (V[:, :, k, :][:, :, None, :].astype(jnp.float32)
                     * weights[:, :, k, :][:, None, :, :].astype(
                         jnp.float32))
    out = out.astype(cd)

    # exit transpose: merge heads straight into (B, T_q, H*D)
    return jnp.transpose(out, (3, 2, 0, 1)).reshape(B, T_q, H * D)


_CORE_STATE = {"enabled": False}  # measured LOSS at AutoInt shape: opt-in


def set_lane_core(enabled: bool):
    """Opt-in switch for the InteractingLayer lane route. TPU A/B at the
    AutoInt criteo shape (F=26, D=8, b32768): 515.3k -> 77.5k ex/s
    (0.15x) — the 26-term unrolled weighted-sum over (H,26,26,B) f32
    scores stops fusing, unlike DSIN's T=10 win. The einsum path's one
    big batched contraction already utilizes well at field-attention
    shapes, so the route ships OFF."""
    _CORE_STATE["enabled"] = bool(enabled)


def lane_core_supported(F, D):
    return _CORE_STATE["enabled"] and F <= 32 and D <= 32


def lane_attention_core(x, W_q, W_k, W_v, D, H, scale, compute_dtype):
    """Mask-free multi-head self-attention over fields in lane-major
    layout (AutoInt InteractingLayer semantics: optional scaling, softmax
    over keys, no masks/blinding). x (B, F, E) -> (B, F, H*D), heads
    merged."""
    B, F, E = x.shape
    cd = compute_dtype
    xt = jnp.transpose(x.astype(cd), (1, 2, 0))  # (F, E, B)

    def proj(W):
        out = jax.lax.dot_general(
            W.astype(cd).T, xt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out.astype(cd).reshape(H, D, F, B)

    Q, K, V = proj(W_q), proj(W_k), proj(W_v)
    scores = jnp.zeros((H, F, F, B), jnp.float32)
    for d in range(D):
        scores = scores + (Q[:, d, :, None, :].astype(jnp.float32)
                           * K[:, d, None, :, :].astype(jnp.float32))
    if scale != 1.0:
        scores = scores * scale
    scores = scores - jnp.max(scores, axis=2, keepdims=True)
    att = jax.nn.softmax(scores, axis=2).astype(cd)
    out = jnp.zeros((H, D, F, B), jnp.float32)
    for k in range(F):
        out = out + (V[:, :, k, :][:, :, None, :].astype(jnp.float32)
                     * att[:, :, k, :][:, None, :, :].astype(jnp.float32))
    return jnp.transpose(out.astype(cd), (3, 2, 0, 1)).reshape(B, F, H * D)
