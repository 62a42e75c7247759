#!/bin/bash
# Round-5 session I: folded saturation curves / Newton (CLOUDSC_FOLD_CURVES,
# CLOUDSC_FOLD_NEWTON) — the compute-side fold motivated by the overlap
# verdict (kernel is compute-bound, stream hidden). Interleaved A/Bs, both
# orders; floor mode quantifies the +10-row stream growth.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab25_satfold.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 15 (fc/fn fold A/B) $(date -u +%FT%TZ) ==="

echo "--- [1] kernel_lab full, (0,0) vs (1,1), order A ---"
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldc 0 --foldn 0 --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldc 1 --foldn 1 --iters 10
echo "--- [2] order B ---"
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldc 1 --foldn 1 --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldc 0 --foldn 0 --iters 10
echo "--- [3] attribution singles (1,0) and (0,1) ---"
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldc 1 --foldn 0 --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldc 0 --foldn 1 --iters 10
echo "--- [4] floor: stream growth of the +10 rows ---"
timeout 900 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldc 0 --foldn 0 --iters 10
timeout 900 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldc 1 --foldn 1 --iters 10
echo "--- [5] bench.py interleaved pairs ---"
CLOUDSC_FOLD_CURVES=0 CLOUDSC_FOLD_NEWTON=0 timeout 900 python bench.py
CLOUDSC_FOLD_CURVES=1 CLOUDSC_FOLD_NEWTON=1 timeout 900 python bench.py
CLOUDSC_FOLD_CURVES=1 CLOUDSC_FOLD_NEWTON=1 timeout 900 python bench.py
CLOUDSC_FOLD_CURVES=0 CLOUDSC_FOLD_NEWTON=0 timeout 900 python bench.py
echo "=== session 15 done $(date -u +%FT%TZ) ==="
# 15b: fn-only bench pairs (the [5] pairs tested (1,1) which fc drags down);
# fc-only at lps=3 probes the block-size hypothesis for the fc loss.
