#!/bin/bash
# Round-3 queue 2: fused-GRU at E=64 after the Bt VMEM fix + DIEN A/B.
set -u
LOG=/tmp/tpu_r3_queue2.log
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
step bench_gru64 4800 python tools/bench_gru.py
step dien_fgru   2400 python bench_models.py DIEN --fused-gru
step din_base    2400 python bench_models.py DIN
echo "=== QUEUE2 DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
