#!/bin/bash
# Round 2 sweep: LARGER tiles — the binning sort is now the dominant cost
# (56 ms in-situ at 16x128) and bigger tiles cut instance duplication; the
# kernel pays more dead pixels per block in exchange. full_fb decides.
set -u
for tile in 16x128 16x256 32x128 32x256 8x256; do
  echo "=== tile=$tile"
  SPLAT360_TILE=$tile SPLAT360_BREAKDOWN_STAGES=tiles,full_fwd,full_fb \
    timeout 900 python scripts/bench_breakdown.py 2>&1 | grep -v WARNING
done
