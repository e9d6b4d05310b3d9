"""Inference throughput: jitted forward-only DeepFM at serving batch sizes.

The serving path (serving.export_stablehlo / CTRModel.predict) runs the
same jitted forward program this measures. Honest mode (device->host read
around the timed loop), chained batches. Prints one JSON line per batch
size.

Run: env PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/bench_infer.py
"""
from __future__ import annotations

import json
import time

import numpy as np

BATCHES = (4096, 32768, 131072)
STEPS = 30


def main():
    import jax
    import jax.numpy as jnp

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import DeepFM

    cols = [SparseFeat("C%d" % i, 100_000, 16) for i in range(26)]
    cols += [DenseFeat("I%d" % i, 1) for i in range(13)]
    model = DeepFM(cols, cols, dnn_hidden_units=(256, 128, 64))
    model.compile("adam", "binary_crossentropy", embedding_dtype="bfloat16")

    rng = np.random.RandomState(0)
    for batch in BATCHES:
        x = {}
        for fc in cols:
            if isinstance(fc, SparseFeat):
                x[fc.name] = rng.randint(
                    0, fc.vocabulary_size, (batch, 1)).astype(np.int32)
            else:
                x[fc.name] = rng.rand(batch, 1).astype(np.float32)
        xc = canonicalize_batch(x, model.feature_columns)
        model._ensure_built(xc)
        fwd = jax.jit(lambda p, s, b: model.module.apply(
            {"params": p, **s}, b, training=False))
        xb = {k: jnp.asarray(v) for k, v in xc.items()}
        params, mstate = model.state.params, model.state.model_state

        out = fwd(params, mstate, xb)
        jax.block_until_ready(out)
        _ = float(jnp.asarray(out).reshape(-1)[0])  # honest mode
        t0 = time.perf_counter()
        for i in range(STEPS):
            # chain: perturb one dense input by the previous output's mean
            xb["I0"] = xb["I0"] + 0.0 * jnp.mean(out)
            out = fwd(params, mstate, xb)
        jax.block_until_ready(out)
        _ = float(jnp.asarray(out).reshape(-1)[-1])
        dt = (time.perf_counter() - t0) / STEPS
        print(json.dumps({
            "metric": "deepfm_inference_examples_per_s_per_chip",
            "batch": batch,
            "value": round(batch / dt, 1),
            "unit": "examples/s",
            "ms_per_batch": round(dt * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
