"""CIN layer as a VMEM-resident outer-product + MXU contraction (Pallas).

xDeepFM's CIN computes, per layer,
    out[b, s, d] = sum_{f,g} W[f, g, s] * x0[b, f, d] * h[b, g, d]
(reference interaction.py:287-306 — D unit-tensor splits + a 1-D conv).
The XLA einsum must materialize the outer-product intermediate
z[(b,d), (f,g)] — at the criteo bench shape that is (524288, 676), a
~0.7-1.4 GB HBM round trip per layer per direction, and it dominates
xDeepFM's step (~20 ms of CIN time at b32768).

Here z never exists in HBM: the layer flattens to lane-major
X (F0, N), H (Fk, N) with N = B*D on the lanes; each grid step builds
its z block (F0*Fk, Nb) in VMEM from 26 broadcast multiplies and feeds
the MXU directly:

    forward:  out_blk (S, Nb)   = W2 (S, F0*Fk) @ z_blk
    backward: dz = W2^T @ dout_blk;  dX/dH by per-field reductions;
              dW accumulated across grid steps in a VMEM f32 scratch
              (recompute — z is rebuilt from X/H, flash-style).

Default-on on TPU within the VMEM gate; set_cin_kernel(False) opts out;
serving export disables it like every Pallas funnel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_STATE = {"enabled": None, "interpret": False}


def set_cin_kernel(enabled, interpret: bool = False):
    """True/False forces; None restores auto (TPU backend on)."""
    _STATE["enabled"] = enabled
    _STATE["interpret"] = bool(interpret)


def cin_enabled():
    if _STATE["enabled"] is not None:
        return bool(_STATE["enabled"])
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def cin_interpret():
    return _STATE["interpret"]


def _pick_nb(N):
    for nb in (512, 256, 128):
        if N % nb == 0:
            return nb
    return None


def cin_supported(F0, Fk, S, N):
    """z block (F0*Fk, Nb) f32 + W (S, F0*Fk) must fit VMEM comfortably."""
    return F0 * Fk <= 2048 and S <= 512 and _pick_nb(N) is not None


def _build_z(x, h):
    """(F0, Nb), (Fk, Nb) -> (F0*Fk, Nb): z[f*Fk+g] = x[f] * h[g]."""
    F0 = x.shape[0]
    return jnp.concatenate([x[f][None, :] * h for f in range(F0)], axis=0)


def _fwd_kernel(x_ref, h_ref, w_ref, o_ref):
    z = _build_z(x_ref[:, :].astype(jnp.float32),
                 h_ref[:, :].astype(jnp.float32))
    o_ref[:, :] = jnp.dot(
        w_ref[:, :].astype(jnp.float32), z,
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(x_ref, h_ref, w_ref, do_ref, dx_ref, dh_ref, dw_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)

    x = x_ref[:, :].astype(jnp.float32)
    h = h_ref[:, :].astype(jnp.float32)
    do = do_ref[:, :].astype(jnp.float32)
    F0, Nb = x.shape
    Fk = h.shape[0]
    z = _build_z(x, h)                                   # (F0*Fk, Nb)
    # dW[s, fg] += dout_blk @ z_blk^T (contract the block lanes)
    dw_ref[:, :] += jax.lax.dot_general(
        do, z, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dz = W^T @ dout
    dz = jax.lax.dot_general(
        w_ref[:, :].astype(jnp.float32), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (F0*Fk, Nb)
    dh = jnp.zeros((Fk, Nb), jnp.float32)
    dx_rows = []
    for f in range(F0):
        dz_f = dz[f * Fk:(f + 1) * Fk, :]                # (Fk, Nb)
        dx_rows.append(jnp.sum(dz_f * h, axis=0, keepdims=True))
        dh = dh + x[f][None, :] * dz_f
    dx_ref[:, :] = jnp.concatenate(dx_rows, axis=0).astype(dx_ref.dtype)
    dh_ref[:, :] = dh.astype(dh_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _cin_core(X, H, W2, interpret):
    """X (F0, N), H (Fk, N), W2 (S, F0*Fk) -> (S, N)."""
    return _cin_fwd_call(X, H, W2, interpret)


def _cin_fwd_call(X, H, W2, interpret):
    F0, N = X.shape
    Fk = H.shape[0]
    S = W2.shape[0]
    Nb = _pick_nb(N)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(N // Nb,),
        in_specs=[
            pl.BlockSpec((F0, Nb), lambda i: (0, i)),
            pl.BlockSpec((Fk, Nb), lambda i: (0, i)),
            pl.BlockSpec((S, F0 * Fk), lambda i: (0, 0)),  # VMEM-resident
        ],
        out_specs=pl.BlockSpec((S, Nb), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((S, N), X.dtype),
        interpret=interpret,
    )(X, H, W2)


def _cin_fwd(X, H, W2, interpret):
    return _cin_fwd_call(X, H, W2, interpret), (X, H, W2)


def _cin_bwd(interpret, res, dout):
    X, H, W2 = res
    F0, N = X.shape
    Fk = H.shape[0]
    S = W2.shape[0]
    Nb = _pick_nb(N)
    dX, dH, dW2 = pl.pallas_call(
        _bwd_kernel,
        grid=(N // Nb,),
        in_specs=[
            pl.BlockSpec((F0, Nb), lambda i: (0, i)),
            pl.BlockSpec((Fk, Nb), lambda i: (0, i)),
            pl.BlockSpec((S, F0 * Fk), lambda i: (0, 0)),
            pl.BlockSpec((S, Nb), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((F0, Nb), lambda i: (0, i)),
            pl.BlockSpec((Fk, Nb), lambda i: (0, i)),
            pl.BlockSpec((S, F0 * Fk), lambda i: (0, 0)),  # accumulates
        ],
        out_shape=[jax.ShapeDtypeStruct((F0, N), X.dtype),
                   jax.ShapeDtypeStruct((Fk, N), H.dtype),
                   jax.ShapeDtypeStruct((S, F0 * Fk), jnp.float32)],
        interpret=interpret,
    )(X, H, W2, dout)
    return dX, dH, dW2.astype(W2.dtype)


_cin_core.defvjp(_cin_fwd, _cin_bwd)


def cin_layer(x0, hidden, W, interpret=False):
    """One CIN layer with the reference contract:
    x0 (B, F0, D), hidden (B, Fk, D), W (F0, Fk, S) -> (B, S, D)
    (bias/activation stay in the caller)."""
    B, F0, D = x0.shape
    Fk = hidden.shape[1]
    S = W.shape[2]
    # lane-major flatten: (F, D, B) -> (F, D*B); the (D*B) axis is the
    # kernel's lane dimension
    X = jnp.transpose(x0, (1, 2, 0)).reshape(F0, D * B)
    H = jnp.transpose(hidden, (1, 2, 0)).reshape(Fk, D * B)
    W2 = jnp.transpose(W.astype(x0.dtype), (2, 0, 1)).reshape(S, F0 * Fk)
    out = _cin_core(X, H, W2, interpret)                 # (S, D*B)
    return jnp.transpose(out.reshape(S, D, B), (2, 0, 1))
