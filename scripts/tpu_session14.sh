#!/bin/bash
# Round-5 session H: pre-packed scan closure A/B (scan_pack outside the
# chained loop vs plain scan) — the lab18 in-step packed closure lost to
# the per-iteration stack rebuild; the pre-pack removes the rebuild.
# Interleaved, both orders. Target: scan > 2.724 M cols/s (A100 bar).
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab24_scanprepack.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 14 (scan pre-pack A/B) $(date -u +%FT%TZ) ==="
export CLOUDSC_BENCH_BACKEND=xla
echo "--- pair 1 (0 then 1) ---"
CLOUDSC_SCAN_PACKED=0 timeout 900 python bench.py
CLOUDSC_SCAN_PACKED=1 timeout 900 python bench.py
echo "--- pair 2 (1 then 0) ---"
CLOUDSC_SCAN_PACKED=1 timeout 900 python bench.py
CLOUDSC_SCAN_PACKED=0 timeout 900 python bench.py
echo "=== session 14 done $(date -u +%FT%TZ) ==="
# 14b: dep threading fixed (tendency_loc_t[-1] — prainfrac was input-only,
# XLA hoisted the live set out of the loop; the pair-1/2 packed numbers
# above are BOGUS). Re-measure.
