#!/bin/bash
# Round-5b session J: (1) section attribution at the NEW final config
# (fn default ON — s34c's share should collapse to its non-Newton rest),
# (2) the 409K size point at the new default, (3) defaults stability pair.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab26_fn_attrib.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 16 (post-fn attribution + 409K) $(date -u +%FT%TZ) ==="

echo "--- [1] attribution skips at the fn config, interleaved ---"
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 --skip '' s521 --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 --skip s34c s37 --iters 10
timeout 900 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --foldn 1 --skip s31 '' --iters 10

echo "--- [2] 409K at the new default (1500 s budget, host pack dominates) ---"
CLOUDSC_BENCH_NGPTOT=409600 timeout 1500 python bench.py

echo "--- [3] defaults stability pair ---"
timeout 900 python bench.py
sleep 45
timeout 900 python bench.py
echo "=== session 16 done $(date -u +%FT%TZ) ==="
