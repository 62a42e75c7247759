#!/bin/bash
# Round-4c measurement session: folded OUTPUT rows (CLOUDSC_FOLD_OUTPUTS)
# + the post-tile-major retunes (lps 3-vs-6 arbiter, SB=16 revisit).
# The output fold drops the 4 derivable half-level flux rows from the
# stream (tests/test_fold_outputs.py). Predictions pre-registered in
# docs/PERFORMANCE.md §folded-output-rows. Tile-major is DEFAULT ON since
# bench/lab15_tilem.log.
#
# Protocol (docs/PERFORMANCE.md rule 0): all A/Bs interleaved within this
# one session; every step under timeout; never pkill.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab16_foldo.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 6 (folded output rows + retunes) $(date -u +%FT%TZ) ==="

echo "--- [0] small-shape Mosaic smoke + fp32 validation table, foldo=1 ---"
CLOUDSC_FOLD_OUTPUTS=1 timeout 560 python -m cloudsc_tpu 1 8192 128 || {
    echo "!!! foldo kernel failed to lower/run — stopping (foldo stays 0)";
    exit 1;
}

echo "--- [1] kernel_lab floor, foldo A/B interleaved (the stream shift) ---"
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 3 --tilem 1 --foldo 0 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 3 --tilem 1 --foldo 1 0 --iters 10   # reverse: drift guard

echo "--- [2] kernel_lab full, foldo A/B interleaved ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 --tilem 1 --foldo 0 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 --tilem 1 --foldo 1 0 --iters 10

echo "--- [3] lps arbiter under tile-major (lab15 [7] saw 8.04 ms @6 but "
echo "        cross-step; this is the interleaved verdict for _lps_for) ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 6 --tilem 1 --foldo 0 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 3 --tilem 1 --foldo 0 --iters 10

echo "--- [4] bench.py interleaved foldo A/B at the default config ---"
for fo in 0 1 1 0 0 1; do
    echo "--- bench foldo=$fo ---"
    CLOUDSC_FOLD_OUTPUTS=$fo timeout 560 python bench.py
done

echo "--- [5] combined: best-lps x foldo single pair ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 --tilem 1 --foldo 0 1 --iters 10

echo "--- [6] SB retune under the contiguous layout (tilem removed the "
echo "        per-step overhead that rejected SB=16; smaller tiles raise "
echo "        the branch-skip fire rate) ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 --sb 32 16 --tilem 1 --foldo 0 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 --sb 16 32 --tilem 1 --foldo 0 --iters 10

echo "--- [7] pure-defaults bench.py (metric-of-record refresh) ---"
timeout 560 python bench.py

echo "=== session 6 done $(date -u +%FT%TZ) ==="
