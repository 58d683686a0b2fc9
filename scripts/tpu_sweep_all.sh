#!/bin/bash
# One-shot measurement queue for when the TPU tunnel is available:
#   1. pallas train smoke (the new kernel/tiling code on real hardware)
#   2. full per-stage breakdown (clean re-baseline after the 3-tier binning)
#   3. larger-tile sweep (the binning sort dominates at 16x128)
#   4. gamma-VPU A/B on the backward kernel
#   5. bench.py (the official number)
# Sequential — ONE TPU process at a time. Log: stdout.
set -u
cd "$(dirname "$0")/.."

echo "=== [1/5] pallas train smoke"
timeout 1200 python scripts/tpu_train_smoke.py 2>&1 | grep -v WARNING | tail -4

echo "=== [2/5] breakdown (default 16x128)"
timeout 1200 python scripts/bench_breakdown.py 2>&1 | grep -v WARNING

echo "=== [3/5] tile sweep"
for tile in 16x256 32x128 32x256 8x256; do
  echo "--- tile=$tile"
  SPLAT360_TILE=$tile SPLAT360_BREAKDOWN_STAGES=tiles,full_fwd,full_fb \
    timeout 1200 python scripts/bench_breakdown.py 2>&1 | grep -v WARNING
done

echo "=== [4/5] gamma-VPU A/B (full_fb)"
SPLAT360_BREAKDOWN_STAGES=full_fb,given_fb timeout 1200 \
  python scripts/bench_breakdown.py 2>&1 | grep -v WARNING
SPLAT360_GAMMA_VPU=1 SPLAT360_BREAKDOWN_STAGES=full_fb,given_fb timeout 1200 \
  python scripts/bench_breakdown.py 2>&1 | grep -v WARNING

echo "=== [5/5] bench.py"
timeout 1200 python bench.py 2>&1 | grep -v WARNING | tail -1
echo "SWEEP_DONE"
