#!/bin/bash
# Round-5 session D: SB retune under the NEW lps=6 default (every prior SB
# sweep ran at lps=3; lps=6 doubles the tile-major block, so the SB optimum
# may shift). Floor + full, both orders, plus a final record refresh.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab20_sb_lps6.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 10 (SB x lps=6 interaction) $(date -u +%FT%TZ) ==="

echo "--- [1] full SB 32-vs-64 @lps6, both orders ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 64 --tilem 1 --foldo 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 64 32 --tilem 1 --foldo 1 --iters 10

echo "--- [2] floor SB 32-vs-64 @lps6, both orders ---"
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 6 --sb 32 64 --tilem 1 --foldo 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 6 --sb 64 32 --tilem 1 --foldo 1 --iters 10

echo "--- [3] full SB 16 @lps6 single probe (rejected at lps3; geometry changed) ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 16 32 --tilem 1 --foldo 1 --iters 10

echo "--- [4] bench.py pure defaults x2 (final record) ---"
timeout 560 python bench.py
timeout 560 python bench.py

echo "=== session 10 done $(date -u +%FT%TZ) ==="
