"""Data-parallel scaling harness (BASELINE.md north star: >=80% scaling).

Runs the DeepFM train step on a 1-device mesh and an N-device mesh with the
same PER-DEVICE batch, and reports weak-scaling efficiency
(examples/s on N devices vs N * examples/s on 1).

On real hardware pass nothing — it uses all visible TPU chips. Without a
pod, exercise the code path on virtual CPU devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py

Prints one JSON line per mesh size.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def _step_rate(devices, per_device_batch=2048, steps=20):
    import jax
    import jax.numpy as jnp

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu.parallel.mesh import make_mesh
    from deepctr_tpu.parallel.sharding import shard_batch

    n = len(devices)
    batch = per_device_batch * n
    mesh = make_mesh((n, 1), ("data", "model"), devices)

    cols = [SparseFeat("C%d" % i, 10_000, 16) for i in range(26)]
    cols += [DenseFeat("I%d" % i, 1) for i in range(13)]
    rng = np.random.RandomState(0)
    x = {}
    for fc in cols:
        if isinstance(fc, SparseFeat):
            x[fc.name] = rng.randint(0, fc.vocabulary_size, (batch, 1)).astype(np.int32)
        else:
            x[fc.name] = rng.rand(batch, 1).astype(np.float32)
    y = rng.randint(0, 2, batch).astype(np.float32)[:, None]
    w = np.ones(batch, np.float32)

    model = DeepFM(cols, cols, dnn_hidden_units=(256, 128, 64))
    model.compile("adam", "binary_crossentropy", mesh=mesh)
    xc = canonicalize_batch(x, model.feature_columns)
    model._ensure_built(xc)
    train_step = model._build_train_step()

    xb = shard_batch(mesh, {k: jnp.asarray(v) for k, v in xc.items()})
    yb, wb = shard_batch(mesh, (jnp.asarray(y), jnp.asarray(w)))
    key = jax.random.PRNGKey(0)
    state = model.state
    state, loss, _ = train_step(state, xb, yb, wb, key)
    jax.block_until_ready(loss)
    # Force the client into synchronous (honest) mode: on the axon backend,
    # block_until_ready does NOT actually wait until the process has done
    # one device->host read — pre-read timings are dispatch-only fantasy
    # (measured "82 PFLOP/s"; see CLAUDE.md round-2 notes).
    _ = float(jnp.asarray(loss).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, _ = train_step(state, xb, yb, wb, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    import jax

    devices = jax.devices()
    r1 = _step_rate(devices[:1])
    print(json.dumps({"metric": "deepfm_scaling_examples_per_s", "devices": 1,
                      "value": round(r1, 1), "unit": "examples/s"}))
    if len(devices) > 1:
        rn = _step_rate(devices)
        eff = rn / (r1 * len(devices))
        print(json.dumps({"metric": "deepfm_scaling_examples_per_s",
                          "devices": len(devices), "value": round(rn, 1),
                          "unit": "examples/s",
                          "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
