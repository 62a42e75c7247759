#!/bin/bash
# Round-5 session E: section attribution at the FINAL production config
# (lps=6, SB=32, fold+tilem+foldo). Earlier attributions ran on older
# bodies (lab11 @lps6-grouped-fold, lab12 @lps3); this is the curve the
# next optimization round should start from. Sorted order, full mode,
# one skip tag per run, interleaved against the '' (full) baseline.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab21_attrib.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 11 (attribution @ final config) $(date -u +%FT%TZ) ==="

echo "--- [1] baseline + heavy-section skips, interleaved ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --skip '' s521 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --skip s37 s34c --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --skip s45s s43b --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --skip s45r s522 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --sb 32 --tilem 1 --foldo 1 --skip s31 '' --iters 10

echo "--- [2] bench.py defaults (cache keep-warm for the round-end run) ---"
timeout 560 python bench.py

echo "=== session 11 done $(date -u +%FT%TZ) ==="
