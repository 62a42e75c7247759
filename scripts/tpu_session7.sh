#!/bin/bash
# Round-5 measurement session A: post-foldo retunes.
#   [1] SB=64 vs 32 under tilem+foldo (the untested floor lever: the DMA
#       probe showed 135->457 GB/s as run length grows and SB scales run
#       length linearly; tile-major made the run contiguous, foldo made it
#       shorter -- SB=64 doubles it back).
#   [2] lps 3-vs-6 arbiter UNDER FOLDO (lab16's arbiter ran foldo=0; the
#       stream shrank ~10% since, shifting the compute/stream balance).
#   [3] floor at the winning SB (speed-of-light refresh).
#   [4] 409K-column size point at pinned lps=3 (persistent compilation
#       cache should hold the Mosaic build from previous 409K attempts;
#       budget 580 s).
# Protocol (docs/PERFORMANCE.md rule 0): all A/Bs interleaved within this
# one session, both orders; every step under timeout; never pkill.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab17_sb64.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 7 (SB=64 + lps-under-foldo + 409K) $(date -u +%FT%TZ) ==="

echo "--- [0] SB=64 Mosaic smoke (small shape; a lowering failure stops [1]) ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --ngptot 16384 --lps 3 --sb 64 --tilem 1 --foldo 1 --iters 3 || {
    echo "!!! SB=64 failed to lower/run -- skipping [1]/[3]"; SB64_OK=0;
}
SB64_OK=${SB64_OK:-1}

if [ "$SB64_OK" = 1 ]; then
echo "--- [1] SB 32-vs-64 full, interleaved both orders (foldo+tilem default on) ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 --sb 32 64 --tilem 1 --foldo 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 --sb 64 32 --tilem 1 --foldo 1 --iters 10
fi

echo "--- [2] lps 3-vs-6 arbiter under foldo, interleaved both orders ---"
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 3 6 --sb 32 --tilem 1 --foldo 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes full --order sorted \
    --lps 6 3 --sb 32 --tilem 1 --foldo 1 --iters 10

if [ "$SB64_OK" = 1 ]; then
echo "--- [3] floor at SB 32-vs-64 (speed-of-light refresh), one pair each order ---"
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 3 --sb 32 64 --tilem 1 --foldo 1 --iters 10
timeout 560 python bench/kernel_lab.py --modes floor --order sorted \
    --lps 3 --sb 64 32 --tilem 1 --foldo 1 --iters 10
fi

echo "--- [4] 409K size point, pinned lps=3, defaults (compile-cache warm) ---"
timeout 580 python bench/kernel_lab.py --modes full --order sorted \
    --ngptot 409600 --lps 3 --sb 32 --tilem 1 --foldo 1 --iters 10

echo "--- [5] bench.py pure defaults x2 (record stability) ---"
timeout 560 python bench.py
timeout 560 python bench.py

echo "=== session 7 done $(date -u +%FT%TZ) ==="
