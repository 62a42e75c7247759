#!/bin/bash
# Round-5b session L: folded deposition A/B (CLOUDSC_FOLD_DEP) — the s37
# chain (1 exp + two **0.666 + sqrt + ~10 divides, input-only all the way
# to the raw amount) as TWO streamed rows. Interleaved, both orders,
# + fd-only bench pairs.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab28_depfold.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 18 (dep fold A/B) $(date -u +%FT%TZ) ==="
echo "--- [1] kernel_lab full, fd 0 vs 1 (fn pinned on), order A ---"
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 --foldd 0 --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 --foldd 1 --iters 10
echo "--- [2] order B ---"
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 --foldd 1 --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 --foldd 0 --iters 10
echo "--- [3] bench.py pairs ---"
CLOUDSC_FOLD_DEP=1 timeout 900 python bench.py
CLOUDSC_FOLD_DEP=0 timeout 900 python bench.py
CLOUDSC_FOLD_DEP=1 timeout 900 python bench.py
echo "=== session 18 done $(date -u +%FT%TZ) ==="
