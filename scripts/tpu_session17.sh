#!/bin/bash
# Round-5b session K: (1) lps 3-vs-6 arbiter UNDER the Newton fold
# (lab25 [7] read lps3/fn 7.885 vs lps6/fn 7.82 cross-run — not powered),
# 3 interleaved pairs alternating orders; (2) defaults stability series.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab27_lps_fn.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 17 (lps arbiter under fn + stability) $(date -u +%FT%TZ) ==="
echo "--- [1] lps arbiter, pairs alternating ---"
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 3 --sb 32 --tilem 1 --foldo 1 --foldn 1 --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 3 --sb 32 --tilem 1 --foldo 1 --foldn 1 --iters 10
echo "--- [2] defaults stability series ---"
for i in 1 2 3 4; do
    timeout 900 python bench.py
    sleep 45
done
echo "=== session 17 done $(date -u +%FT%TZ) ==="
