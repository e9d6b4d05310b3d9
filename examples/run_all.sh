#!/usr/bin/env bash
# Smoke-run every example (parity with reference examples/run_all.sh).
set -e
cd "$(dirname "$0")"
export PYTHONPATH="$(dirname "$PWD"):${PYTHONPATH}"
for f in run_*.py; do
    echo "=== $f ==="
    python "$f"
done
echo "all examples done"
