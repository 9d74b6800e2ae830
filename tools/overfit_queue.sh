#!/bin/bash
# Serial on-chip overfit-proof queue (VERDICT r4 item 3): convergence-level
# proofs through the production CLIs for the entry points OVERFIT.json does
# not yet cover.  Order = judged priority: ATF and the IDF 5-stage pipeline
# first, then MAF / PA-ATF / PT-MAF.  Each run appends its row to
# OVERFIT.json incrementally, so a timeout mid-queue keeps earlier proofs.
# The axon tunnel serializes — never run two entries concurrently.
set -u
cd "$(dirname "$0")/.."
STEPS="${STEPS:-2000}"
for m in "$@"; do
  echo "=== overfit $m (steps=$STEPS) $(date -u +%H:%M:%S) ==="
  timeout 5400 python tools/overfit_synth.py --method "$m" --steps "$STEPS" \
    || echo "!!! $m failed rc=$?"
done
echo "=== queue done $(date -u +%H:%M:%S) ==="
cat OVERFIT.json
