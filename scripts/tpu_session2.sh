#!/bin/bash
# Follow-up TPU session: A/B the s521 per-round dynamic skips (63f82fc,
# default OFF) and complete the section attribution for the post-fold body.
# Pre-registered prediction (bench/activity_probe.py, sorted layout, lps 3 default):
# round conds fire at 8.3/0/10.2/0% vs the outer s521 cond's 27.9%, so
# most of the rounds' share of the 1.04 ms s521 residual (lab11 [4])
# should vanish, against ~4 nested-cond overheads amortized inside the
# 27.9%-fired branch. Net call: somewhere between -0.1 and -0.5 ms/step;
# keep the flag default OFF unless the measured win clears the +-0.25 ms
# noise on BOTH the bench.py pair and the kernel_lab pair.
# Every step under timeout (never pkill; see CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab12_roundskip.log
exec > >(tee -a "$LOG") 2>&1

echo "=== TPU session 2 $(date -u +%FT%TZ) ==="

echo "--- [s2-0] Mosaic smoke: round-skip body (cond nesting depth 3) ---"
CLOUDSC_S521_ROUND_SKIP=1 timeout 560 python -m cloudsc_tpu 1 16384 128 --kernel pallas 2>&1 | tail -8

echo "--- [s2-1] bench.py A/B pairs, interleaved (off/on/on/off) ---"
timeout 560 python bench.py
CLOUDSC_S521_ROUND_SKIP=1 timeout 560 python bench.py
CLOUDSC_S521_ROUND_SKIP=1 timeout 560 python bench.py
timeout 560 python bench.py

echo "--- [s2-2] kernel_lab A/B (identical harness, sorted layout, lps 3 default) ---"
timeout 580 python bench/kernel_lab.py --order sorted --lps 3
CLOUDSC_S521_ROUND_SKIP=1 timeout 580 python bench/kernel_lab.py --order sorted --lps 3

echo "--- [s2-3] attribution completion: the branch-resident sections ---"
timeout 580 python bench/kernel_lab.py --order sorted --lps 3 \
    --skip "" s43b s45r s45s s44b s34e s46

echo "--- [s2-4] layout triplet rerun (lab11 [3] timed out pre-cache) ---"
timeout 580 python bench/kernel_lab.py --order cyclic grouped sorted --lps 3

echo "--- [s2-4b] clean size sweep, lps pinned to 3 (lab11 [4d] rows mixed"
echo "---        lps configs: the default flipped mid-session) ---"
for ng in 65536 163840 245760 327680 409600; do
    CLOUDSC_BENCH_NGPTOT="$ng" CLOUDSC_PALLAS_LPS=3 timeout 580 python bench.py
done

echo "--- [s2-5] on-device validation at benchmark scale (fp32-eps table) ---"
timeout 560 python -m cloudsc_tpu 1 163840 128 --kernel pallas 2>&1 | tail -30

echo "=== session 2 done $(date -u +%FT%TZ) ==="
