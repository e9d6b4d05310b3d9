"""Fused short-sequence attention kernel vs the XLA path, on real TPU.

Shapes: BST behavior history (B=4096, H=4, T=50, D=8) and AutoInt fields
(B=32768, H=2, T=27, D=8). Forward and forward+backward (grads wrt
q/k/v — the training pattern). Parity-checked in the same run.

    PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
        python tools/bench_attention.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def bench_one(name, B, H, T, D, masked, blinding, scale, reps, rounds):
    import jax
    import jax.numpy as jnp

    from deepctr_tpu.ops.attention import (fused_attention,
                                           reference_attention)

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    km = None
    if masked:
        lens = rng.randint(1, T + 1, (B,))
        km = jnp.asarray((np.arange(T)[None, :] < lens[:, None])
                         .astype(np.float32))

    fused_f = jax.jit(lambda q, k, v: fused_attention(
        q, k, v, km, scale=scale, blinding=blinding))
    ref_f = jax.jit(lambda q, k, v: reference_attention(
        q, k, v, km, scale=scale, blinding=blinding))
    fused_g = jax.jit(jax.grad(lambda qkv: (fused_attention(
        qkv[0], qkv[1], qkv[2], km, scale=scale,
        blinding=blinding) ** 2).sum()))
    ref_g = jax.jit(jax.grad(lambda qkv: (reference_attention(
        qkv[0], qkv[1], qkv[2], km, scale=scale,
        blinding=blinding) ** 2).sum()))

    # both paths run DEFAULT MXU precision (bf16 passes) with different
    # contraction shapes -> bf16-class tolerance
    a, b = fused_f(q, k, v), ref_f(q, k, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=3e-2, atol=3e-2)
    ga, gb = fused_g((q, k, v)), ref_g((q, k, v))
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-2, atol=5e-2)

    fns = {"fused_fwd": lambda: fused_f(q, k, v),
           "xla_fwd": lambda: ref_f(q, k, v),
           "fused_grad": lambda: fused_g((q, k, v)),
           "xla_grad": lambda: ref_g((q, k, v))}
    for f in fns.values():
        out = f()
        jax.block_until_ready(out)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])

    res = {n: [] for n in fns}
    for _r in range(rounds):
        for n, f in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = f()
            jax.block_until_ready(out)
            _ = float(jnp.asarray(
                jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
            res[n].append((time.perf_counter() - t0) / reps * 1e3)

    line = {"case": name, "B": B, "H": H, "T": T, "D": D,
            "masked": masked, "blinding": blinding}
    for n, vls in res.items():
        line[n + "_ms"] = round(float(np.median(vls)), 3)
    line["fwd_speedup"] = round(line["xla_fwd_ms"] / line["fused_fwd_ms"], 2)
    line["grad_speedup"] = round(
        line["xla_grad_ms"] / line["fused_grad_ms"], 2)
    print(json.dumps(line), flush=True)


def main():
    bench_one("bst_history", 4096, 4, 50, 8, True, True, 1 / np.sqrt(8),
              reps=5, rounds=3)
    bench_one("autoint_fields", 32768, 2, 27, 8, False, False, 1.0,
              reps=5, rounds=3)


if __name__ == "__main__":
    main()
