#!/bin/bash
# Round-5b session M: definitive attribution at the FINAL config
# (fn ON, lps=6/SB=32/tilem/foldo) — full tag list, baselines bracketing
# every pair, 10 iters. The lab26 pass had drifty baselines (8.17 vs 7.83).
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab29_attrib_final.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 19 (final attribution) $(date -u +%FT%TZ) ==="
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 \
    --skip '' s521 '' --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 \
    --skip s37 '' s34c --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 \
    --skip '' s31 s43b --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 \
    --skip s522 '' s45r --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 \
    --skip s45s s34e '' --iters 10
echo "--- floor at the final config ---"
timeout 900 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 --iters 10
echo "=== session 19 done $(date -u +%FT%TZ) ==="
