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


def _step_rate(devices, per_device_batch=2048, steps=20, model_par=1,
               sparse=False, sharded_lookup=None):
    import jax
    import jax.numpy as jnp

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.features import canonicalize_batch
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu.parallel.mesh import make_mesh
    from deepctr_tpu.parallel.sharding import shard_batch

    n = len(devices)
    batch = per_device_batch * n  # global batch fixed by device count, so
    # rates stay comparable across model_par at the same n
    mesh = make_mesh((n // model_par, model_par), ("data", "model"), devices)

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
    model.compile("adam", "binary_crossentropy", mesh=mesh,
                  sparse_embedding_updates=sparse,
                  sharded_lookup=sharded_lookup)
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


def pinned_rate(n, per_device_batch=2048, steps=20, model_par=1,
                sparse=False, sharded_lookup=None):
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
        "per_device_batch={b}, steps={s}, model_par={m}, sparse={sp}, "
        "sharded_lookup={sl!r}))".format(
            n=n, b=per_device_batch, s=steps, m=model_par, sp=sparse,
            sl=sharded_lookup))
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
    rates = {}
    for n in sizes:
        if n > (os.cpu_count() or 1):
            break
        r = pinned_rate(n, per_device_batch, steps)
        rates[n] = r
        rec = {"metric": "deepfm_scaling_examples_per_s_pinned",
               "devices": n, "cores_per_device": 1,
               "value": round(r, 1), "unit": "examples/s"}
        if n > min(rates):
            rec["scaling_efficiency"] = round(r / (rates[min(rates)] * n
                                                   / min(rates)), 3)
        prev = max((m for m in rates if m < n), default=None)
        if prev:
            # relative efficiency vs the previous size is the honest gate
            # on a shared-memory host: the 1-core run serializes host
            # dispatch against compute (deflated baseline), so vs-1
            # "efficiency" comes out superlinear (VERDICT r4 weak #3)
            rec["relative_efficiency_vs_%d" % prev] = round(
                r / (rates[prev] * n / prev), 3)
        print(json.dumps(rec), flush=True)


_MP_WORKER = r"""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=os.environ["COORD"],
                           num_processes=int(os.environ["NPROC"]),
                           process_id=int(sys.argv[1]))
import jax.numpy as jnp
from deepctr_tpu import DenseFeat, SparseFeat
from deepctr_tpu.features import canonicalize_batch
from deepctr_tpu.models import DeepFM
from deepctr_tpu.parallel.distributed import global_mesh, make_global_batch

nproc = jax.process_count()
B = int(os.environ["PDB"])  # local rows per process
steps = int(os.environ["STEPS"])
mesh = global_mesh((jax.device_count(), 1), ("data", "model"))
cols = [SparseFeat("C%d" % i, 10_000, 16) for i in range(26)]
cols += [DenseFeat("I%d" % i, 1) for i in range(13)]
rng = np.random.RandomState(jax.process_index())
x = {}
for fc in cols:
    if isinstance(fc, SparseFeat):
        x[fc.name] = rng.randint(0, fc.vocabulary_size, (B, 1)).astype(np.int32)
    else:
        x[fc.name] = rng.rand(B, 1).astype(np.float32)
y = rng.randint(0, 2, B).astype(np.float32)[:, None]
w = np.ones(B, np.float32)
model = DeepFM(cols, cols, dnn_hidden_units=(256, 128, 64))
model.compile("adam", "binary_crossentropy", mesh=mesh)
xc = canonicalize_batch(x, model.feature_columns)
xg, yg, wg = make_global_batch(mesh, xc, y, w)
model._ensure_built(xg)
train_step = model._build_train_step()
key = jax.random.PRNGKey(0)
state = model.state
state, loss, _ = train_step(state, xg, yg, wg, key)
jax.block_until_ready(loss)
_ = float(np.asarray(loss).reshape(-1)[0])
t0 = time.perf_counter()
for _ in range(steps):
    # the REAL multi-host fit codepath: per-step global-batch assembly
    # from process-local rows + the sharded train step
    xg, yg, wg = make_global_batch(mesh, xc, y, w)
    state, loss, _ = train_step(state, xg, yg, wg, key)
jax.block_until_ready(loss)
dt = time.perf_counter() - t0
if jax.process_index() == 0:
    print("MPRATE=%r" % (B * nproc * steps / dt))
"""


def multiprocess_rate(nproc=2, per_device_batch=2048, steps=20):
    """Throughput of the REAL multi-host codepath: ``nproc`` OS processes
    (1 virtual device + 1 pinned core each) coordinated via
    jax.distributed, each feeding its local shard through
    ``make_global_batch`` every step (parallel/distributed.py — the path
    multi-host fit() takes). Comparable to ``pinned_rate(nproc)``, which
    runs the same global batch single-process."""
    import socket
    import subprocess
    import sys
    import tempfile

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    here = os.path.dirname(os.path.abspath(__file__))
    with tempfile.NamedTemporaryFile(
            "w", suffix=".py", delete=False) as f:
        f.write(_MP_WORKER)
        script = f.name
    env = dict(os.environ,
               COORD="127.0.0.1:%d" % port, NPROC=str(nproc),
               PDB=str(per_device_batch), STEPS=str(steps),
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, script, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True)
        for i in range(nproc)
    ]
    rate = None
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
            for line in out.splitlines():
                if line.startswith("MPRATE="):
                    rate = float(line.split("=", 1)[1])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        os.unlink(script)
    if rate is None:
        raise RuntimeError("no MPRATE in worker output:\n" +
                           "\n---\n".join(o[-2000:] for o in outs))
    return rate


def main_multiprocess(per_device_batch=2048, steps=20):
    r2p = multiprocess_rate(2, per_device_batch, steps)
    r2s = pinned_rate(2, per_device_batch, steps)
    print(json.dumps({
        "metric": "deepfm_multihost_examples_per_s_pinned",
        "processes": 2, "devices": 2, "cores_per_device": 1,
        "value": round(r2p, 1), "unit": "examples/s",
        "single_process_2dev_rate": round(r2s, 1),
        "multihost_overhead_ratio": round(r2p / r2s, 3)}), flush=True)


if __name__ == "__main__":
    import sys

    if "--pinned" in sys.argv:
        main_pinned()
    elif "--multiproc" in sys.argv:
        main_multiprocess()
    else:
        main()
