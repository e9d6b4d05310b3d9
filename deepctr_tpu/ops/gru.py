"""Pallas TPU kernel: whole-sequence fused GRU / AGRU / AUGRU.

DIEN's interest extraction+evolution (reference models/sequence/dien.py:66-109
driving contrib/rnn_v2.py:802's while-loop over T) is the framework's one
genuinely sequential hot loop. The XLA `lax.scan` lowering issues, per
timestep, two tiny matmuls ((B, E+U) @ (E+U, 3U) at CTR dims E=U=8..32)
plus a handful of VPU ops — T*2 dependent kernel launches whose issue
latency, not FLOPs, dominates (CLAUDE.md: DIEN 0.22M ex/s at b4096, T=50;
scan unrolling measured no help).

This kernel runs the ENTIRE sequence in one Pallas program:
- layout is (T, E, B): batch on the LANE axis (128-wide, no padding waste
  at CTR dims, where E=8..32 in lanes would waste 4-16x), features on
  sublanes. A block is Bt batch lanes (512/256/128, the widest whose
  BACKWARD buffers fit Mosaic's 16 MB scoped-VMEM stack — E=U=64, T=50
  needs Bt=128); the grid walks batch blocks.
- the gate/candidate weights (pre-transposed, (3U, E+U) total — a few KB)
  sit in VMEM for the whole sequence; each timestep is two MXU calls
  (Wg^T @ [x;h], Wc^T @ [x;r*h]) with zero dispatch overhead between
  steps (a `fori_loop` inside the kernel, h carried in VMEM).
- the backward pass is the same loop REVERSED: it recomputes gates from
  x_t and the saved carries (h_t), accumulates dWg/dWc/db in VMEM, and
  emits dx/da — the (B,T,*) gate activations never exist in HBM (the XLA
  scan saves all of them as residuals).

Semantics match layers.sequence._GRUScan exactly (TF-cell-compatible
gate math, contrib/utils.py:149-378; state freeze past sequence length):
    r,u = sigmoid([x,h] @ Wg + bg)
    c   = tanh([x, r*h] @ Wc + bc)
    GRU:   h' = u*h + (1-u)*c
    AGRU:  h' = (1-a)*h + a*c
    AUGRU: u' = (1-a)*u ; h' = u'*h + (1-u')*c
    carry = m*h' + (1-m)*h
The kernel returns the carries (B, T, U); the caller derives per-step
outputs (carry*m) and the final state (carry at T-1).

E and U are padded to sublane multiples (8); padded weight rows/columns
are zero, so padded hidden units stay exactly 0 through the recurrence
(zg=0 -> u=0.5, c=0 -> h'=0.5*h from h0=0) and padded gradients vanish.

Integration: DEFAULT on the TPU backend (measured 9.8-13x over the scan
fwd+bwd, DIEN +22% end-to-end — BASELINE.md round-3 table), shape-gated
by ``fused_gru_supported``; other backends default to the scan.
``CTRModel.compile(..., fused_gru=True/False)`` (or ``set_fused_gru``)
overrides; ``None`` restores the backend auto policy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Mosaic's scoped-vmem stack limit is 16 MB; the backward block must fit
# under it WITH the pipeline's double buffering. Measured calibration
# (v5e): (T=50, Ep=Up=64, Bt=256) allocates 25.67 MB — the estimate below
# says 28.7 MB — so a ~15.5 MB estimate budget keeps real usage under 16.
_SCOPED_VMEM_BUDGET = int(15.5 * 1024 * 1024)


def _pad8(n: int) -> int:
    return n + ((-n) % 8)


def _block_bytes(T: int, Ep: int, Up: int, Bt: int) -> int:
    # bwd holds x, hseq, g, dx (T, Ep/Up, Bt) + m/a/da at sublane-8 pad,
    # double-buffered by the pipeline
    return 4 * Bt * T * (2 * Ep + 2 * Up + 3 * 8) * 2


def _pick_bt(T: int, E: int, U: int):
    """Largest batch-lane block whose BACKWARD buffers fit scoped VMEM.
    None when even the 128-lane minimum doesn't fit (fall back to scan)."""
    Ep, Up = _pad8(E), _pad8(U)
    for Bt in (512, 256, 128):
        if _block_bytes(T, Ep, Up, Bt) <= _SCOPED_VMEM_BUDGET:
            return Bt
    return None


def fused_gru_supported(T: int, E: int, U: int) -> bool:
    """Shapes whose per-block buffers fit the VMEM budget (else XLA scan)."""
    return T >= 1 and _pick_bt(T, E, U) is not None


# process-wide funnel switch (same pattern as ops.attention). enabled=None
# means AUTO: on for the TPU backend, where the kernel is a measured
# 10-14x win over lax.scan (BASELINE.md: 36.1 -> 3.7 ms fwd+bwd at
# B=4096 T=50 E=U=64 AUGRU, DIEN +22% end-to-end); off elsewhere
# (interpret mode on CPU is for parity tests, not speed).
_FUSED_GRU = {"enabled": None, "interpret": False}


def set_fused_gru(enabled, interpret: bool = False):
    """Enable/disable the fused GRU path inside layers.sequence._GRUScan
    (None restores the backend-based AUTO default)."""
    _FUSED_GRU["enabled"] = None if enabled is None else bool(enabled)
    _FUSED_GRU["interpret"] = bool(interpret)


def fused_gru_enabled():
    if _FUSED_GRU["enabled"] is None:
        return jax.default_backend() == "tpu"
    return _FUSED_GRU["enabled"]


def fused_gru_interpret():
    return _FUSED_GRU["interpret"]


def _step_gates(x, h, wg, bg, wc, bc, U):
    """Recompute r, u, c for one timestep (shared fwd/bwd). All (rows, Bt)."""
    xh = jnp.concatenate([x, h], axis=0)
    zg = jax.lax.dot_general(
        wg, xh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    g = jax.nn.sigmoid(zg + bg)
    r, u = g[:U], g[U:]
    xrh = jnp.concatenate([x, r * h], axis=0)
    zc = jax.lax.dot_general(
        wc, xrh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    c = jnp.tanh(zc + bc)
    return xh, g, r, u, xrh, c


def _new_state(h, u, c, a, m, gru_type):
    if gru_type == "AGRU":
        nh = (1.0 - a) * h + a * c
    elif gru_type == "AUGRU":
        u2 = (1.0 - a) * u
        nh = u2 * h + (1.0 - u2) * c
    else:
        nh = u * h + (1.0 - u) * c
    return m * nh + (1.0 - m) * h


def _fwd_kernel(x_ref, m_ref, a_ref, wg_ref, bg_ref, wc_ref, bc_ref,
                hseq_ref, *, T, U, gru_type):
    wg, bg, wc, bc = wg_ref[:], bg_ref[:], wc_ref[:], bc_ref[:]
    Bt = x_ref.shape[-1]

    def body(t, h):
        _, _, _, u, _, c = _step_gates(x_ref[t], h, wg, bg, wc, bc, U)
        hn = _new_state(h, u, c, a_ref[t], m_ref[t], gru_type)
        hseq_ref[t] = hn
        return hn

    jax.lax.fori_loop(0, T, body, jnp.zeros((U, Bt), jnp.float32))


def _bwd_kernel(x_ref, m_ref, a_ref, wg_ref, bg_ref, wc_ref, bc_ref,
                hseq_ref, g_ref,
                dx_ref, da_ref, dwg_ref, dbg_ref, dwc_ref, dbc_ref,
                *, T, U, gru_type):
    wg, bg, wc, bc = wg_ref[:], bg_ref[:], wc_ref[:], bc_ref[:]
    EU = wg.shape[1]
    E = EU - U
    Bt = x_ref.shape[-1]

    def body(i, carry):
        dh, dwg, dbg_a, dwc, dbc_a = carry
        t = T - 1 - i
        x, m, a = x_ref[t], m_ref[t], a_ref[t]
        hp = jnp.where(
            t > 0, hseq_ref[jnp.maximum(t - 1, 0)],
            jnp.zeros((U, Bt), jnp.float32))
        xh, g, r, u, xrh, c = _step_gates(x, hp, wg, bg, wc, bc, U)

        dcarry = dh + g_ref[t]
        dnh = dcarry * m
        dh2 = dcarry * (1.0 - m)  # freeze-branch grad to h_{t-1}
        if gru_type == "AGRU":
            da_t = jnp.sum(dnh * (c - hp), axis=0, keepdims=True)
            dc = dnh * a
            dh2 = dh2 + dnh * (1.0 - a)
            du = jnp.zeros_like(c)
        elif gru_type == "AUGRU":
            u2 = (1.0 - a) * u
            du2 = dnh * (hp - c)
            da_t = jnp.sum(-du2 * u, axis=0, keepdims=True)
            du = du2 * (1.0 - a)
            dc = dnh * (1.0 - u2)
            dh2 = dh2 + dnh * u2
        else:
            da_t = jnp.zeros((1, Bt), jnp.float32)
            du = dnh * (hp - c)
            dc = dnh * (1.0 - u)
            dh2 = dh2 + dnh * u

        dzc = dc * (1.0 - c * c)                       # (U, Bt)
        dbc_a = dbc_a + jnp.sum(dzc, axis=1, keepdims=True)
        dwc = dwc + jax.lax.dot_general(                # (U, EU)
            dzc, xrh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxrh = jax.lax.dot_general(                     # (EU, Bt)
            wc, dzc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_t = dxrh[:E]
        drh = dxrh[E:]
        dr = drh * hp
        dh2 = dh2 + drh * r

        dzg = jnp.concatenate([dr, du], axis=0) * g * (1.0 - g)
        dbg_a = dbg_a + jnp.sum(dzg, axis=1, keepdims=True)
        dwg = dwg + jax.lax.dot_general(                # (2U, EU)
            dzg, xh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxh = jax.lax.dot_general(                      # (EU, Bt)
            wg, dzg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_t = dx_t + dxh[:E]
        dh2 = dh2 + dxh[E:]

        dx_ref[t] = dx_t
        da_ref[t] = da_t
        return dh2, dwg, dbg_a, dwc, dbc_a

    init = (jnp.zeros((U, Bt), jnp.float32),
            jnp.zeros(dwg_ref.shape[1:], jnp.float32),
            jnp.zeros(dbg_ref.shape[1:], jnp.float32),
            jnp.zeros(dwc_ref.shape[1:], jnp.float32),
            jnp.zeros(dbc_ref.shape[1:], jnp.float32))
    _, dwg, dbg_a, dwc, dbc_a = jax.lax.fori_loop(0, T, body, init)
    dwg_ref[0] = dwg
    dbg_ref[0] = dbg_a
    dwc_ref[0] = dwc
    dbc_ref[0] = dbc_a


def _pad_weights(Wg, bg, Wc, bc, E, U, Ep, Up):
    """Pad (E+U, 2U)/(E+U, U) weights to (Ep+Up, 2Up)/(Ep+Up, Up) with the
    x-rows, h-rows, r-columns and u-columns each padded independently."""
    EUp = Ep + Up
    Wgp = jnp.zeros((EUp, 2 * Up), jnp.float32)
    Wgp = Wgp.at[:E, :U].set(Wg[:E, :U])
    Wgp = Wgp.at[:E, Up:Up + U].set(Wg[:E, U:])
    Wgp = Wgp.at[Ep:Ep + U, :U].set(Wg[E:, :U])
    Wgp = Wgp.at[Ep:Ep + U, Up:Up + U].set(Wg[E:, U:])
    bgp = jnp.zeros((2 * Up, 1), jnp.float32)
    bgp = bgp.at[:U, 0].set(bg[:U])
    bgp = bgp.at[Up:Up + U, 0].set(bg[U:])
    Wcp = jnp.zeros((EUp, Up), jnp.float32)
    Wcp = Wcp.at[:E, :U].set(Wc[:E])
    Wcp = Wcp.at[Ep:Ep + U, :U].set(Wc[E:])
    bcp = jnp.zeros((Up, 1), jnp.float32)
    bcp = bcp.at[:U, 0].set(bc)
    return Wgp, bgp, Wcp, bcp


def _to_kernel_layout(x, m, a, B, T, Ep, Bp):
    """(B,T,E)->(T,Ep,Bp) f32, (B,T)->(T,1,Bp), (B,T,1)->(T,1,Bp)."""
    E = x.shape[-1]
    xt = jnp.transpose(x.astype(jnp.float32), (1, 2, 0))      # (T, E, B)
    xt = jnp.pad(xt, ((0, 0), (0, Ep - E), (0, Bp - B)))
    mt = jnp.transpose(m.astype(jnp.float32), (1, 0))[:, None, :]
    mt = jnp.pad(mt, ((0, 0), (0, 0), (0, Bp - B)))
    at = jnp.transpose(a.astype(jnp.float32).reshape(B, T), (1, 0))[:, None, :]
    at = jnp.pad(at, ((0, 0), (0, 0), (0, Bp - B)))
    return xt, mt, at


def _common_specs(T, Ep, Up, Bt):
    blk = lambda shape, im: pl.BlockSpec(shape, im)
    EUp = Ep + Up
    return [
        blk((T, Ep, Bt), lambda b: (0, 0, b)),        # x
        blk((T, 1, Bt), lambda b: (0, 0, b)),         # m
        blk((T, 1, Bt), lambda b: (0, 0, b)),         # a
        blk((2 * Up, EUp), lambda b: (0, 0)),         # Wg^T
        blk((2 * Up, 1), lambda b: (0, 0)),           # bg
        blk((Up, EUp), lambda b: (0, 0)),             # Wc^T
        blk((Up, 1), lambda b: (0, 0)),               # bc
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _gru_core(x, m, a, Wg, bg, Wc, bc, gru_type, interpret, dims):
    """carries (B, T, U) of the masked recurrence; custom VJP.

    ``dims`` = (B, T, E, U) as a static tuple (residuals must hold only
    arrays, so the shapes travel as a nondiff argument).
    """
    carries, _ = _gru_fwd(x, m, a, Wg, bg, Wc, bc, gru_type, interpret, dims)
    return carries


def _gru_fwd(x, m, a, Wg, bg, Wc, bc, gru_type, interpret, dims):
    B, T, E, U = dims
    Ep, Up = _pad8(E), _pad8(U)
    Bt = _pick_bt(T, E, U)
    if Bt is None:
        raise ValueError(
            "fused GRU backward buffers exceed scoped VMEM at T=%d E=%d "
            "U=%d; gate with fused_gru_supported()" % (T, E, U))
    Bp = B + ((-B) % Bt)
    xt, mt, at = _to_kernel_layout(x, m, a, B, T, Ep, Bp)
    Wgp, bgp, Wcp, bcp = _pad_weights(
        Wg.astype(jnp.float32), bg.astype(jnp.float32),
        Wc.astype(jnp.float32), bc.astype(jnp.float32), E, U, Ep, Up)
    wg_t, wc_t = Wgp.T, Wcp.T

    hseq = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, U=Up, gru_type=gru_type),
        grid=(Bp // Bt,),
        in_specs=_common_specs(T, Ep, Up, Bt),
        out_specs=pl.BlockSpec((T, Up, Bt), lambda b: (0, 0, b)),
        out_shape=jax.ShapeDtypeStruct((T, Up, Bp), jnp.float32),
        interpret=interpret,
    )(xt, mt, at, wg_t, bgp, wc_t, bcp)
    carries = jnp.transpose(hseq[:, :U, :B], (2, 0, 1))
    res = (xt, mt, at, wg_t, bgp, wc_t, bcp, hseq)
    return carries, res


def _gru_bwd(gru_type, interpret, dims, res, g):
    xt, mt, at, wg_t, bgp, wc_t, bcp, hseq = res
    B, T, E, U = dims
    Ep, Up = _pad8(E), _pad8(U)
    Bp = xt.shape[-1]
    Bt = _pick_bt(T, E, U)
    nb = Bp // Bt
    EUp = Ep + Up
    gt = jnp.transpose(g.astype(jnp.float32), (1, 2, 0))  # (T, U, B)
    gt = jnp.pad(gt, ((0, 0), (0, Up - U), (0, Bp - B)))

    dx_t, da_t, dwg_p, dbg_p, dwc_p, dbc_p = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, U=Up, gru_type=gru_type),
        grid=(nb,),
        in_specs=_common_specs(T, Ep, Up, Bt) + [
            pl.BlockSpec((T, Up, Bt), lambda b: (0, 0, b)),   # carries
            pl.BlockSpec((T, Up, Bt), lambda b: (0, 0, b)),   # dL/dcarries
        ],
        out_specs=[
            pl.BlockSpec((T, Ep, Bt), lambda b: (0, 0, b)),   # dx
            pl.BlockSpec((T, 1, Bt), lambda b: (0, 0, b)),    # da
            pl.BlockSpec((1, 2 * Up, EUp), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 2 * Up, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Up, EUp), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Up, 1), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Ep, Bp), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((nb, 2 * Up, EUp), jnp.float32),
            jax.ShapeDtypeStruct((nb, 2 * Up, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb, Up, EUp), jnp.float32),
            jax.ShapeDtypeStruct((nb, Up, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xt, mt, at, wg_t, bgp, wc_t, bcp, hseq, gt)

    dx = jnp.transpose(dx_t[:, :E, :B], (2, 0, 1))
    da = jnp.transpose(da_t[:, :, :B], (2, 0, 1))              # (B, T, 1)
    dwg_t = jnp.sum(dwg_p, axis=0)                             # (2Up, EUp)
    dwc_t = jnp.sum(dwc_p, axis=0)
    dbg_f = jnp.sum(dbg_p, axis=0)[:, 0]
    dbc_f = jnp.sum(dbc_p, axis=0)[:, 0]
    # un-pad back to the natural orientations/segments
    dWg = jnp.zeros((E + U, 2 * U), jnp.float32)
    dWg = dWg.at[:E, :U].set(dwg_t[:U, :E].T)
    dWg = dWg.at[:E, U:].set(dwg_t[Up:Up + U, :E].T)
    dWg = dWg.at[E:, :U].set(dwg_t[:U, Ep:Ep + U].T)
    dWg = dWg.at[E:, U:].set(dwg_t[Up:Up + U, Ep:Ep + U].T)
    dWc = jnp.zeros((E + U, U), jnp.float32)
    dWc = dWc.at[:E].set(dwc_t[:U, :E].T)
    dWc = dWc.at[E:].set(dwc_t[:U, Ep:Ep + U].T)
    dbg = jnp.concatenate([dbg_f[:U], dbg_f[Up:Up + U]])
    dbc = dbc_f[:U]
    return (dx, jnp.zeros((B, T), jnp.float32), da, dWg, dbg, dWc, dbc)


_gru_core.defvjp(lambda *args: _gru_fwd(*args), _gru_bwd)


def fused_gru_carries(x, step_mask, att_scores, gate_kernel, gate_bias,
                      cand_kernel, cand_bias, gru_type="GRU",
                      interpret=False):
    """Carries (B, T, U) of the masked GRU/AGRU/AUGRU recurrence.

    ``x``: (B, T, E); ``step_mask``: (B, T) floats (1 = valid, prefix of
    ones); ``att_scores``: (B, T, 1) or None (GRU). Per-step outputs are
    ``carries * step_mask[..., None]`` and the final state is
    ``carries[:, -1]`` — both differentiable through this function.
    """
    B, T, E = x.shape
    U = cand_kernel.shape[1]
    a = (jnp.zeros((B, T, 1), jnp.float32) if att_scores is None
         else att_scores.reshape(B, T, -1)[:, :, :1].astype(jnp.float32))
    # everything enters the custom VJP in f32 so the returned cotangents
    # (always f32) match the primal dtypes; carries come back f32 like
    # the scan path's h
    return _gru_core(x.astype(jnp.float32), step_mask.astype(jnp.float32),
                     a, gate_kernel.astype(jnp.float32),
                     gate_bias.astype(jnp.float32),
                     cand_kernel.astype(jnp.float32),
                     cand_bias.astype(jnp.float32), gru_type, interpret,
                     (B, T, E, U))
