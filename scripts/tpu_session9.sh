#!/bin/bash
# Round-5 session C: the properly powered lps 3-vs-6 arbiter under the
# production defaults (fold+tm+foldo). Two prior arbiters were ambiguous
# one-pair reads; this runs FOUR alternating-order interleaved pairs (warm
# cache after the first), plus a floor pair, so the verdict has real power.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab19_lps.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 9 (powered lps arbiter) $(date -u +%FT%TZ) ==="

echo "--- [1] four alternating full pairs, iters 10 ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 6 --sb 32 --tilem 1 --foldo 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 3 --sb 32 --tilem 1 --foldo 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 6 --sb 32 --tilem 1 --foldo 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 3 --sb 32 --tilem 1 --foldo 1 --iters 10

echo "--- [2] floor pair, both orders ---"
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 3 6 --sb 32 --tilem 1 --foldo 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 6 3 --sb 32 --tilem 1 --foldo 1 --iters 10

echo "--- [3] bench.py lps A/B (the metric-of-record arbiter) ---"
for l in 3 6 6 3; do
    echo "--- bench lps=$l ---"
    CLOUDSC_PALLAS_LPS=$l timeout 560 python bench.py
done

echo "=== session 9 done $(date -u +%FT%TZ) ==="
