#!/bin/bash
# Round-3 queue 3: sequence-floor physics (VERDICT item 7).
set -u
LOG=/tmp/tpu_r3_queue3.log
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
step hist_dedup     2400 python tools/bench_hist_dedup.py
step seq_scan10     3600 python bench_models.py DIN DIEN BST
step seq_scan25     3600 python bench_models.py DIN DIEN BST --scan=25
step matmul_gather  2400 python tools/bench_matmul_gather.py
echo "=== QUEUE3 DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
