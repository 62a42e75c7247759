#!/bin/bash
# Round-5 session G: DMA/compute overlap probe matrix — is the production
# kernel serial (stream + compute) or overlapped-and-compute-bound?
# plain/alias/scratch/prod variants x w in {0,8,16,32} FMA-chain loads.
set -u
cd "$(dirname "$0")/.."
LOG=bench/lab23_overlap.log
exec > >(tee -a "$LOG") 2>&1
echo "=== TPU session 13 (overlap probe) $(date -u +%FT%TZ) ==="
timeout 1200 python bench/overlap_probe.py --variants plain alias --w 0 8 16 32 --iters 20
timeout 1200 python bench/overlap_probe.py --variants scratch prod --w 0 8 16 32 --iters 20
echo "=== session 13 done $(date -u +%FT%TZ) ==="
# 13b: scatter-add lowering fixed (concatenate), branchy variant added
