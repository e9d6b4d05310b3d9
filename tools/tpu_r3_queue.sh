#!/bin/bash
# Round-3 TPU A/B queue (VERDICT item 1). Sequential — only ONE process may
# use the TPU at a time; each step is a fresh process (honest-mode
# discipline + HBM pressure isolation). Run: bash tools/tpu_r3_queue.sh
set -u
LOG=/tmp/tpu_r3_queue.log
ENVV="PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon"
cd /root/repo

step() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "=== [$name] start $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout "$tmo" env PYTHONPATH=/root/repo:/root/.axon_site \
      JAX_PLATFORMS=axon "$@" >> "$LOG" 2>&1
  echo "=== [$name] rc=$? end $(date -u +%H:%M:%S) ===" >> "$LOG"
}

: > "$LOG"
step cache_probe     2400 python tools/probe_compile_cache.py
step bench_gru       4800 python tools/bench_gru.py
step bench_attention 4800 python tools/bench_attention.py
step models_base     3600 python bench_models.py BST AutoInt
step models_fused    3600 python bench_models.py BST AutoInt --fused
step models_fused_mp 3600 python bench_models.py BST AutoInt --fused --mp
step dien_base       2400 python bench_models.py DIEN
step dien_fgru       2400 python bench_models.py DIEN --fused-gru
step matmul_gather   2400 python tools/bench_matmul_gather.py
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
