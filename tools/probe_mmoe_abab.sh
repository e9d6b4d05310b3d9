#!/bin/bash
# MMOE r3-vs-current ABAB (VERDICT r4 weak #2): alternate fresh-process
# MMOE bench runs between the CURRENT tree and the round-3 code
# (git worktree at fc5c1ac, /tmp/r3code) in one service window.
# Usage: bash tools/probe_mmoe_abab.sh   (needs the TPU free)
set -u
ENVV="PYTHONPATH_CUR=/root/repo:/root/.axon_site"
for i in 1 2; do
  echo "== A(current) =="
  timeout 1200 env PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
    python /root/repo/bench_models.py MMOE 2>/dev/null | grep '^{'
  echo "== B(r3 fc5c1ac) =="
  timeout 1200 env PYTHONPATH=/tmp/r3code:/root/.axon_site JAX_PLATFORMS=axon \
    python /tmp/r3code/bench_models.py MMOE 2>/dev/null | grep '^{'
done
echo "== control: DeepFM current =="
timeout 1200 env PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
  python /root/repo/bench_models.py DeepFM 2>/dev/null | grep '^{'
