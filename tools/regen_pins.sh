#!/bin/bash
# Regenerate the self-generated regression pins (oracle parquet for queries
# no independent engine can recompute). Run ONLY after deliberately changing
# langid/perplexity/minhash/simhash/LSH/IVF/pipeline semantics, then review
# the diff before committing — a pin blesses current behavior.
#
# Usage: tools/regen_pins.sh  (from the repo root)
set -euo pipefail
OUT=/tmp/verify_pins
PINS=src/test/resources/golden/pins_sf0.01
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
mkdir -p "$PINS"
for q in q_ann_ivf; do
  src=$(ls "$OUT/$q"/part-*.parquet)
  cp "$src" "$PINS/$q.parquet"
  echo "pinned $q ($(wc -c < "$PINS/$q.parquet") bytes)"
done
