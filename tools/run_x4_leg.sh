#!/bin/bash
# x4 tier down_mix fine-tune leg (VERDICT r4 #2): the recipe that lifted the
# x2 tier (+5.40 -> +6.27 dB over three legs, r4) applied to tpu4_x4@40k,
# eval-gated like every other leg. Run ONE leg at a time on the TPU;
# rollback = restore latest.txt to the previous step.
#   usage: tools/run_x4_leg.sh <steps> <seed> [extra train args...]
set -e
cd "$(dirname "$0")/.."
STEPS=${1:-12000}
SEED=${2:-51}
shift 2 || true
echo "=== x4 leg: +${STEPS} steps, seed ${SEED}, down_mix 0.5 $*"
python -m nu_scaler_tpu.models.train --arch tpu4 --stages 2 \
  --steps "$STEPS" --seed "$SEED" --down-mix 0.5 "$@"
echo "=== held-out eval (bf16)"
python -m nu_scaler_tpu.models.train --arch tpu4 --stages 2 --eval
