#!/bin/bash
# Round-4b measurement session: DMA contiguity (tile-major packed layout,
# CLOUDSC_TILE_MAJOR) — the stream-FLOOR attack. The measured floor
# (6.01 ms at 160K, bench/lab14_fold.log) is ~77% of v5e HBM peak; each
# grid step currently issues lps*nrows separate 16 kB runs. The synthetic
# probe [0] decides whether run length is the limiter BEFORE any production
# numbers; [3] gates the production A/Bs on Mosaic lowering of the
# 5-D-block kernel. Steps independent of tile-major ([0]-[2]) run FIRST so
# a lowering failure cannot cost their measurements.
#
# Protocol (docs/PERFORMANCE.md rule 0): all A/Bs interleaved within this
# one session; every step under timeout; never pkill.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab15_tilem.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 5 (dma contiguity / tile-major) $(date -u +%FT%TZ) ==="

echo "--- [0] synthetic DMA probe: run-length curve + strided vs tilemajor ---"
timeout 560 python bench/dma_probe.py --iters 20 || {
    echo "!!! dma_probe failed — continuing to production steps anyway"; }

echo "--- [1] floor vs lps (grid-step overhead share of the floor) ---"
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 2 3 6 --tilem 0 --iters 10

echo "--- [2] scan engine unroll 4 vs 8 (last sub-A100 engine; +5% closes it) ---"
for u in 4 8 4 8; do
    echo "--- scan unroll=$u ---"
    CLOUDSC_BENCH_BACKEND=xla CLOUDSC_SCAN_UNROLL=$u \
        timeout 560 python bench.py
done

echo "--- [3] small-shape Mosaic smoke + fp32 validation table, tilem=1 ---"
CLOUDSC_TILE_MAJOR=1 timeout 560 python -m cloudsc_tpu 1 8192 128 || {
    echo "!!! tile-major kernel failed to lower/run — stopping (tilem stays 0)";
    exit 1;
}

echo "--- [4] kernel_lab floor, tilem A/B interleaved (the floor shift) ---"
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 3 --tilem 0 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 3 --tilem 1 0 --iters 10   # reverse order: drift guard

echo "--- [5] kernel_lab full, tilem A/B interleaved ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 --tilem 0 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 --tilem 1 0 --iters 10

echo "--- [6] bench.py interleaved tilem A/B at the default config ---"
for tm in 0 1 1 0 0 1; do
    echo "--- bench tilem=$tm ---"
    CLOUDSC_TILE_MAJOR=$tm timeout 560 python bench.py
done

echo "--- [7] lps re-sweep under tilem=1 (contiguity may shift the optimum) ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 2 3 --tilem 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --tilem 1 --iters 10

echo "=== session 5 done $(date -u +%FT%TZ) ==="
