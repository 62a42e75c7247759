#!/bin/bash
# One-shot TPU measurement session: run everything worth measuring the
# moment the tunneled chip is reachable, logging to bench/lab11_grouped.log.
# Order matters — the decisive grouped-vs-cyclic comparison runs first so a
# flaky tunnel still yields the key number. Every step is under timeout
# (never pkill; see CLAUDE.md).
#
# TWO changes land together since the last measured 11.0 ms (lab10 body +
# rain sub-branch): (a) the activity-grouped layout default and (b) the
# solver/tendency fold into the precip branch (commit e679abb). Decompose:
#   step [2b] (cyclic) vs lab10's 11.22 ms  -> fold-only delta
#   step [1]  (grouped) vs step [2b]        -> layout delta
# Pre-registered predictions: fold -0.5..-0.9 ms (LU 0.47 + 4.6/5.3/6 on
# ~2/3 inert tiles), grouped -1.3..-1.5 ms; combined ~8.8-9.4 ms/step
# (~17.5-18.5 M cols/s).
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab11_grouped.log
exec > >(tee -a "$LOG") 2>&1

echo "=== TPU session $(date -u +%FT%TZ) ==="

echo "--- [0] small-shape Mosaic smoke (fast lowering check of the new body) ---"
timeout 400 python -m cloudsc_tpu 1 16384 128 --kernel pallas 2>&1 | tail -8

echo "--- [1] bench.py, grouped layout (default) ---"
timeout 560 python bench.py

echo "--- [2a] bench.py, grouped unsorted (CLOUDSC_GROUP_SORT=0) ---"
CLOUDSC_GROUP_SORT=0 timeout 560 python bench.py

echo "--- [2b] bench.py, cyclic layout (CLOUDSC_GROUP_COLUMNS=0) ---"
CLOUDSC_GROUP_COLUMNS=0 timeout 560 python bench.py

echo "--- [3] kernel_lab cyclic vs grouped vs sorted (identical methodology) ---"
timeout 580 python bench/kernel_lab.py --order cyclic grouped sorted --lps 6

echo "--- [4] kernel_lab section attribution under the sorted layout ---"
timeout 580 python bench/kernel_lab.py --order sorted --lps 6 \
    --skip "" s521 s34c s37 s522 s31 s33

echo "--- [4a2] init/floor/resident bodies (section-1 share never measured) ---"
timeout 580 python bench/kernel_lab.py --order sorted --lps 6 \
    --modes init floor resident full

echo "--- [4b] SB sweep under the sorted layout (probe: SB=8 cuts s521 rate 27->22%) ---"
# never-compiled kernel shapes: budget ~3 min Mosaic compile EACH, one
# invocation per config so a timeout loses only that config
for sb in 8 16 32; do
    timeout 580 python bench/kernel_lab.py --order sorted --lps 6 --sb "$sb"
done

echo "--- [4c] lps sweep under the sorted layout (branchier body may shift the optimum) ---"
# lps resolves to the largest divisor of nlev+1=138 (1,2,3,6,23,...) not
# exceeding the request - sweep actual divisors, not 4/8/12 (those resolve
# to 3/6/6: one duplicate, one wasted config)
for lps in 2 3 23; do
    timeout 580 python bench/kernel_lab.py --order sorted --lps "$lps"
done

echo "--- [4d] size sweep under the grouped default (flatness check; fills ---"
echo "---      the blank 245K/327K/409K row of docs/PERFORMANCE.md) ---"
for ng in 65536 245760 327680 409600; do
    CLOUDSC_BENCH_NGPTOT="$ng" timeout 580 python bench.py
done

echo "--- [4e] scan engine (XLA path) unroll variants (VERDICT r2 item 7) ---"
# CPU: unroll hurt fp32 (-8% at 4) but helped fp64 (+13-16%); the TPU fp32
# answer needs this on-device A/B. Keep whichever wins as the documented
# default (CLOUDSC_SCAN_UNROLL in physics/cloudsc.py).
for u in 1 2 4; do
    CLOUDSC_BENCH_BACKEND=xla CLOUDSC_SCAN_UNROLL="$u" CLOUDSC_BENCH_ITERS=5 \
        timeout 580 python bench.py
done

echo "--- [5] CLI smoke, both engines (verify surfaces) ---"
timeout 560 python -m cloudsc_tpu 1 16384 128 --kernel pallas | tail -30
timeout 560 python -m cloudsc_tpu 1 16384 128 --kernel scan | tail -5

echo "=== session done $(date -u +%FT%TZ) ==="
