#!/bin/bash
# Round-4 measurement session: the FOLDED packed layout (CLOUDSC_FOLD_INPUTS)
# — the input-side roofline attack (~1/3 fewer streamed input rows; see
# kernels/pallas_cloudsc._PACK_ROWS_F and docs/PERFORMANCE.md).
#
# Protocol (PERFORMANCE.md rule 0): every A/B is INTERLEAVED within this one
# session; cross-session numbers only inform the trend line. Small-shape
# Mosaic smoke first so a lowering failure in the new layout costs seconds,
# not the session. Every step under timeout; never pkill.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab14_fold.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 4 (folded layout) $(date -u +%FT%TZ) ==="

echo "--- [0] small-shape Mosaic smoke + fp32 validation table, fold=1 ---"
CLOUDSC_FOLD_INPUTS=1 timeout 560 python -m cloudsc_tpu 1 8192 128 || {
    echo "!!! folded kernel failed to lower/run — stopping (fold stays 0)";
    exit 1;
}

echo "--- [1] bench.py interleaved fold A/B at the default config (lps=3) ---"
for fold in 0 1 1 0 0 1; do
    echo "--- bench fold=$fold ---"
    CLOUDSC_FOLD_INPUTS=$fold timeout 560 python bench.py
done

echo "--- [2] kernel_lab full+floor, fold A/B (the stream-floor shift) ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 --fold 0 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 3 --fold 0 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 --fold 1 0 --iters 10   # reverse order: drift guard

echo "--- [3] lps re-sweep under fold=1 (input DMA volume changed) ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 2 3 --fold 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --fold 1 --iters 10

echo "--- [4] init body under fold=1 (level_init share at the new floor) ---"
timeout 560 python bench/kernel_lab.py --modes init --order sorted \
    --lps 3 --fold 1 --iters 10

echo "=== session 4 done $(date -u +%FT%TZ) ==="
