"""A/B: whole-sequence Pallas GRU kernel (ops/gru.py) vs lax.scan, on TPU.

Measures forward+backward (value_and_grad of a scalar loss) at DIEN bench
shapes, honest mode (device->host read before and after the timed loop),
chained dependencies. Each configuration runs in a FRESH subprocess
(CLAUDE.md: several live models in one process cause HBM pressure), and
each mode traces its own jitted step — the fused/scan switch is read at
TRACE time, so reusing one jitted function would silently re-measure the
cached scan executable. Prints one JSON line per configuration.

Run: env PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/bench_gru.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
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
    mod = _GRUScan(U, gru_type)
    variables = mod.init(jax.random.PRNGKey(0), x, lengths=lengths,
                         att_scores=att)

    def loss(params, x):
        out, final = mod.apply({"params": params}, x, lengths=lengths,
                               att_scores=att)
        return jnp.sum(out * out) + jnp.sum(final)

    def measure(fused):
        # the fused switch is consulted when _GRUScan traces — build and
        # trace a FRESH jitted step under each mode (a shared one would be
        # a cache hit re-measuring the first-traced path)
        G.set_fused_gru(fused, interpret=jax.default_backend() == "cpu")
        try:
            step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
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
        finally:
            G.set_fused_gru(False)

    ms_scan = measure(False)
    ms_fused = measure(True)
    print(json.dumps({
        "metric": "gru_fwd_bwd_ms", "B": B, "T": T, "E": E,
        "gru_type": gru_type, "scan_ms": round(ms_scan, 3),
        "fused_ms": round(ms_fused, 3),
        "speedup": round(ms_scan / ms_fused, 2),
    }), flush=True)


def main():
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        B, T, E = (int(v) for v in sys.argv[i + 1:i + 4])
        run(B, T, E, sys.argv[i + 4])
        return
    # fresh process per configuration (HBM pressure isolation)
    for cfg in CONFIGS:
        cmd = [sys.executable, os.path.abspath(__file__), "--one",
               str(cfg[0]), str(cfg[1]), str(cfg[2]), cfg[3]]
        subprocess.run(cmd, env=os.environ, timeout=2400, check=False)


if __name__ == "__main__":
    main()
