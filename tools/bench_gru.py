"""A/B: whole-sequence Pallas GRU kernel (ops/gru.py) vs lax.scan, on TPU.

Measures forward+backward (value_and_grad of a scalar loss) at DIEN bench
shapes, honest mode (device->host read before and after the timed loop),
chained dependencies. Prints one JSON line per configuration.

Run: env PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/bench_gru.py
"""
from __future__ import annotations

import json
import time

import numpy as np

CONFIGS = [
    # (B, T, E=U, gru_type)
    (4096, 50, 64, "AUGRU"),   # DIEN bench shape (item+cate dim-32 concat)
    (4096, 50, 16, "AUGRU"),
    (4096, 50, 64, "GRU"),
]
STEPS = 30


def run(B, T, E, gru_type):
    import jax
    import jax.numpy as jnp

    from deepctr_tpu.layers.sequence import _GRUScan
    from deepctr_tpu.ops import gru as G

    U = E
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    lengths = jnp.asarray(rng.randint(1, T + 1, (B, 1)).astype(np.int32))
    att = jnp.asarray(rng.rand(B, T, 1).astype(np.float32))
    mod = _GRUScan(U, gru_type if gru_type != "GRU" else "GRU")
    variables = mod.init(jax.random.PRNGKey(0), x, lengths=lengths,
                         att_scores=att)

    def loss(params, x):
        out, final = mod.apply({"params": params}, x, lengths=lengths,
                               att_scores=att)
        return jnp.sum(out * out) + jnp.sum(final)

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    def measure():
        v, (gp, gx) = step(variables["params"], x)
        jax.block_until_ready(v)
        _ = float(v)  # honest mode
        xs = x
        t0 = time.perf_counter()
        for _ in range(STEPS):
            v, (gp, gx) = step(variables["params"], xs)
            xs = x + 1e-12 * gx  # chain dependency
        jax.block_until_ready(v)
        _ = float(v)
        return (time.perf_counter() - t0) / STEPS * 1e3  # ms

    G.set_fused_gru(False)
    ms_scan = measure()
    G.set_fused_gru(True, interpret=jax.default_backend() == "cpu")
    try:
        ms_fused = measure()
    finally:
        G.set_fused_gru(False)
    print(json.dumps({
        "metric": "gru_fwd_bwd_ms", "B": B, "T": T, "E": E,
        "gru_type": gru_type, "scan_ms": round(ms_scan, 3),
        "fused_ms": round(ms_fused, 3),
        "speedup": round(ms_scan / ms_fused, 2),
    }))


def main():
    for cfg in CONFIGS:
        run(*cfg)


if __name__ == "__main__":
    main()
