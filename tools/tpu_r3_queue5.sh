#!/bin/bash
# Round-3 queue 5: sequence suite at the new B_SEQ=8192 default.
set -u
LOG=/tmp/tpu_r3_queue5.log
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
for m in DIN DIEN BST DSIN; do
  step "seq_$m" 3000 python bench_models.py "$m"
done
step seq_mp 3600 python bench_models.py BST DSIN --mp
echo "=== QUEUE5 DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
