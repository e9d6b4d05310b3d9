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


def main(sizes=None):
    """Weak-scaling sweep. Reports TWO efficiencies per mesh size:

    - ``scaling_efficiency``: rate_N / (N * rate_1) — the real-hardware
      number (each device is its own silicon).
    - ``core_normalized_efficiency``: rate_N / (min(N, nproc) * rate_1) —
      the honest number on VIRTUAL CPU devices, where N "devices" share
      nproc physical cores and the device-normalized ceiling is nproc/N
      by construction. On a real pod the two coincide; on virtual meshes
      core-normalized isolates what this bench can actually measure
      there: the SPMD partitioner/collective overhead of the sharded
      train step vs the single-device program.
    """
    import jax

    devices = jax.devices()
    nproc = os.cpu_count() or 1
    r1 = _step_rate(devices[:1])
    print(json.dumps({"metric": "deepfm_scaling_examples_per_s", "devices": 1,
                      "value": round(r1, 1), "unit": "examples/s"}))
    sizes = sizes or sorted({n for n in (2, 4, 8, len(devices))
                             if 1 < n <= len(devices)})
    for n in sizes:
        rn = _step_rate(devices[:n])
        eff = rn / (r1 * n)
        core_eff = rn / (r1 * min(n, nproc))
        print(json.dumps({"metric": "deepfm_scaling_examples_per_s",
                          "devices": n, "value": round(rn, 1),
                          "unit": "examples/s",
                          "scaling_efficiency": round(eff, 3),
                          "core_normalized_efficiency": round(core_eff, 3),
                          "physical_cores": nproc}))


def pinned_rate(n, per_device_batch=2048, steps=20):
    """Rate for an n-device virtual mesh with exactly ONE PHYSICAL CORE
    PER DEVICE (taskset-pinned subprocess) — the faithful weak-scaling
    simulation on a CPU host: each 'chip' owns its silicon, so
    rate_N / (N * rate_1) is a real efficiency, unlike the shared-core
    in-process sweep (where single-device XLA already multithreads over
    every core and the ratio measures thread scheduling, not SPMD cost)."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import bench_scaling as bs\n"
        "print('RATE=%r' % bs._step_rate(jax.devices()[:{n}], "
        "per_device_batch={b}, steps={s}))".format(
            n=n, b=per_device_batch, s=steps))
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=%d" % n)
    out = subprocess.run(
        ["taskset", "-c", "0-%d" % (n - 1), sys.executable, "-c", code],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.abspath(__file__)))
    for line in out.stdout.splitlines():
        if line.startswith("RATE="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(out.stderr[-2000:])


def main_pinned(sizes=(1, 2, 4), per_device_batch=2048, steps=20):
    r1 = None
    for n in sizes:
        if n > (os.cpu_count() or 1):
            break
        r = pinned_rate(n, per_device_batch, steps)
        rec = {"metric": "deepfm_scaling_examples_per_s_pinned",
               "devices": n, "cores_per_device": 1,
               "value": round(r, 1), "unit": "examples/s"}
        if r1 is None:
            r1 = r
        else:
            rec["scaling_efficiency"] = round(r / (r1 * n), 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    import sys

    if "--pinned" in sys.argv:
        main_pinned()
    else:
        main()
