#!/bin/bash
# Round-5 measurement session B:
#   [1] scan engine packed-closure A/B (CLOUDSC_SCAN_PACKED: 5 dynamic
#       slices/level instead of ~40) — the VERDICT-suggested attempt to
#       push the scan engine past the 2.72 M cols/s A100 bar (from 2.59).
#   [2] 409K-column size point with the budget the host pack actually
#       needs (~4 GB through ~40 MB/s memcpy; 580 s was never enough).
#   [3] metric-of-record refresh on pure defaults.
# Protocol: interleaved within-session A/Bs, both orders; timeout per step.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab18_scanpack.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 8 (scan packed closure + 409K) $(date -u +%FT%TZ) ==="

echo "--- [1] scan packed-closure A/B, interleaved (backend=xla, unroll default) ---"
for sp in 0 1 1 0 0 1; do
    echo "--- scan packed=$sp ---"
    CLOUDSC_BENCH_BACKEND=xla CLOUDSC_SCAN_PACKED=$sp CLOUDSC_BENCH_ITERS=5 \
        timeout 560 python bench.py
done

echo "--- [2] 409K size point, defaults, long budget ---"
timeout 1500 python bench/kernel_lab.py --modes full --order sorted \
    --ngptot 409600 --lps 3 --sb 32 --tilem 1 --foldo 1 --iters 10

echo "--- [3] bench.py pure defaults (record refresh) ---"
timeout 560 python bench.py

echo "=== session 8 done $(date -u +%FT%TZ) ==="
