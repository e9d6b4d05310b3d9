#!/bin/bash
# Round-3 queue 4: refresh the 8-model suite at the new defaults
# (scan=25, fused GRU default) + bench.py headline, fresh process each.
set -u
LOG=/tmp/tpu_r3_queue4.log
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
for m in DeepFM DCN WDL xDeepFM AutoInt DIN DIEN BST; do
  step "suite_$m" 3000 python bench_models.py "$m"
done
step autoint_mp 3000 python bench_models.py AutoInt xDeepFM BST --mp
step bench_py   3000 python bench.py
echo "=== QUEUE4 DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
