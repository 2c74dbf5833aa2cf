#!/bin/bash
# RD curve sweep over latent config (VERDICT r3 item 5): the Lambda sweep
# proved the operating point is architecture-set in this regime, so the
# curve is traced by y_channel (how the reference moves the trade-off via
# latent size, utils/CompressFramework.py:315-333), plus one converged
# AutoEncoder-variant point.  Run on TPU from the repo root:
#   bash scripts/nflr_rd_sweep.sh
set -u
cd "$(dirname "$0")/.."
STEPS=${STEPS:-20000}
SGA=${SGA:-3000}
OUT=${OUT:-outputs/nflr_rd}
for args in \
  "--variant NFLR_Coding_Hyper_AutoDecoder --y-channel 8" \
  "--variant NFLR_Coding_Hyper_AutoDecoder --y-channel 48" \
  "--variant NFLR_Coding_Hyper_AutoEncoder --y-channel 24" \
; do
  echo "=== nflr_rd $args (steps=$STEPS) ==="
  timeout 5400 python scripts/nflr_rd.py $args \
      --steps "$STEPS" --sga-steps "$SGA" --lambda 8000 --out "$OUT" \
      || echo "RUN FAILED: $args"
done
echo "sweep done; results in $OUT/results.jsonl"
