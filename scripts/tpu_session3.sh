#!/bin/bash
# Mini session: settle the lps default with a WITHIN-session interleaved
# bench.py A/B (sessions drift ~0.5-1 ms between them — lab11 vs lab12 —
# so the cross-session lps comparison was confounded). Compiles are cached.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab13_lps_ab.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 3 $(date -u +%FT%TZ) ==="
for lps in 6 3 3 6 6 3; do
    echo "--- lps=$lps ---"
    CLOUDSC_PALLAS_LPS=$lps timeout 560 python bench.py
done
echo "=== session 3 done $(date -u +%FT%TZ) ==="
