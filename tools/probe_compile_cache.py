"""Does JAX's persistent compilation cache work on the axon TPU backend?

Two questions, answered in two fresh subprocesses sharing one cache dir:
  1. Does executable serialization succeed (cache files appear on disk)?
  2. Does process 2 skip the remote compile wait (compile time collapses)?

Run: env PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/probe_compile_cache.py
Prints one JSON line with both processes' compile seconds and the verdict.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

CHILD = r"""
import json, os, sys, time
import numpy as np
import deepctr_tpu
deepctr_tpu.enable_compilation_cache(sys.argv[1], min_compile_time_secs=0.5)
import jax, jax.numpy as jnp

x = jnp.asarray(np.random.RandomState(0).standard_normal((2048, 512)),
                jnp.float32)
w = jnp.asarray(np.random.RandomState(1).standard_normal((512, 512)),
                jnp.float32)

@jax.jit
def f(x, w):
    for _ in range(8):
        x = jnp.tanh(x @ w)
    return x.sum()

t0 = time.time()
lowered = f.lower(x, w)
compiled = lowered.compile()
compile_s = time.time() - t0
_ = float(compiled(x, w))  # honest-mode D2H read
print(json.dumps({"compile_s": round(compile_s, 3)}))
"""


def run_child(cache_dir):
    env = dict(os.environ)
    p = subprocess.run([sys.executable, "-c", CHILD, cache_dir],
                       capture_output=True, text=True, env=env, timeout=1800)
    line = [l for l in p.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    return json.loads(line), p.returncode


def main():
    cache_dir = tempfile.mkdtemp(prefix="deepctr_cache_probe_")
    try:
        r1, rc1 = run_child(cache_dir)
        files = []
        for root, _, names in os.walk(cache_dir):
            files += [os.path.join(root, n) for n in names]
        nbytes = sum(os.path.getsize(f) for f in files)
        r2, rc2 = run_child(cache_dir)
        speedup = (r1["compile_s"] / r2["compile_s"]
                   if r2["compile_s"] > 0 else float("inf"))
        print(json.dumps({
            "probe": "persistent_compilation_cache",
            "proc1_compile_s": r1["compile_s"],
            "proc2_compile_s": r2["compile_s"],
            "cache_files": len(files),
            "cache_bytes": nbytes,
            "serialization_works": len(files) > 0,
            "proc2_skips_compile": bool(files) and speedup > 2.0,
            "speedup": round(speedup, 2),
        }))
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
