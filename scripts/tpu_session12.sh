#!/bin/bash
# Round-5 session F: pure-defaults stability series — 6 spaced bench.py
# runs to pin the session band of the FINAL configuration (and keep the
# compilation cache warm for the round-end metric run).
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab22_stability.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 12 (defaults stability series) $(date -u +%FT%TZ) ==="
for i in 1 2 3 4 5 6; do
    echo "--- run $i $(date -u +%T) ---"
    timeout 560 python bench.py
    sleep 60
done
echo "=== session 12 done $(date -u +%FT%TZ) ==="
