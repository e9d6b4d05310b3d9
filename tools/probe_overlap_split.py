"""Is the ~2x row-DMA overlap regime recoverable by program structure?

VERDICT r4 weak #6: r2 captures overlapped random row DMAs at factor
~1.9-2.3; r4/r5 captures sit AT the no-overlap bound (0.93). Two
hypotheses: (a) the shared backend's service changed (nothing to do), or
(b) the overlap is schedule-dependent and more independent gather trees
per step would recover it.

This probes (b): the same DeepFM b131072 step, but the loss is computed
as the mean over N independent batch SLICES inside one program — the
embedding gathers/scatters become N independent subtrees per table (26*N
chunks instead of 26), giving XLA's scheduler more DMA chains to
interleave. Mathematically identical training step (row-wise model,
equal-weight mean; l2-reg sown per slice is rescaled).

Fresh subprocess per config (in-process A/Bs lie — CLAUDE.md):

    python tools/probe_overlap_split.py           # driver: splits 1,2,4
    PROBE_SPLIT=2 python tools/probe_overlap_split.py one   # worker
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 131072
SCAN = 25
CALLS = 3


def run_one(n_split):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    import bench

    try:
        from deepctr_tpu import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    cols, model = bench._make_model()

    if n_split > 1:
        inner = model.module

        class SplitApply(nn.Module):
            """Mean-equivalent N-way split: each slice is an independent
            subgraph; outputs re-concatenate so the training step (loss,
            grads, update) is mathematically the full-batch step."""

            inner_m: nn.Module
            n: int

            @nn.compact
            def __call__(self, xb, training=False):
                B = next(iter(xb.values())).shape[0]
                step = B // self.n
                outs = []
                for i in range(self.n):
                    xi = {k: v[i * step:(i + 1) * step]
                          for k, v in xb.items()}
                    outs.append(self.inner_m(xi, training=training))
                return jnp.concatenate(outs, axis=0)

        model.module = SplitApply(inner_m=inner, n=n_split)

    from deepctr_tpu.features import canonicalize_batch

    rng = np.random.RandomState(0)
    x = {}
    for fc in model.feature_columns:
        if hasattr(fc, "vocabulary_size"):
            x[fc.name] = rng.randint(0, fc.vocabulary_size,
                                     (BATCH, 1)).astype(np.int32)
        else:
            x[fc.name] = rng.rand(BATCH, 1).astype(np.float32)
    xc = canonicalize_batch(x, model.feature_columns)
    model._ensure_built(xc)
    multi = model._build_multi_train_step(SCAN)
    xK, yK, wK = bench._make_inputs(model, BATCH, seed=7)
    key = jax.random.PRNGKey(0)
    state = model.state
    state, losses, _ = multi(state, xK, yK, wK, key)
    jax.block_until_ready(losses)
    _ = float(jnp.asarray(losses).reshape(-1)[0])  # honest mode
    t0 = time.perf_counter()
    for _ in range(CALLS):
        state, losses, _ = multi(state, xK, yK, wK, key)
    jax.block_until_ready(losses)
    _ = float(jnp.asarray(losses).reshape(-1)[-1])
    rate = BATCH * SCAN * CALLS / (time.perf_counter() - t0)
    print(json.dumps({"metric": "overlap_split_probe", "n_split": n_split,
                      "batch": BATCH, "scan": SCAN,
                      "value": round(rate, 1), "unit": "examples/s"}),
          flush=True)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for n in (1, 2, 4):
        env = dict(os.environ, PROBE_SPLIT=str(n))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one"],
            env=env, cwd=os.path.join(here, ".."), capture_output=True,
            text=True, timeout=2400)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if out.returncode != 0:
            print(json.dumps({"n_split": n, "error": out.stderr[-400:]}),
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(int(os.environ.get("PROBE_SPLIT", "1")))
    else:
        main()
