#!/bin/bash
# Tile-shape x MXU-precision sweep of the pallas compositor on the real TPU.
# Run directly (JAX_PLATFORMS=axon ambient); sequential - one TPU.
set -u
for cfg in "16x128 highest" "16x64 highest" "8x128 highest" "16x32 highest" "8x64 highest" "16x128 high" ; do
  set -- $cfg
  tile=$1; prec=$2
  echo "=== tile=$tile precision=$prec"
  SPLAT360_TILE=$tile SPLAT360_KERNEL_PRECISION=$prec SPLAT360_BREAKDOWN_QUICK=1 \
    timeout 900 python scripts/bench_breakdown.py 2>&1 | grep -v WARNING
done
