#!/usr/bin/env bash
# Quadrotor reverse-spawn-curriculum sweep (PARITY.md "Quadrotor": 4/6
# seeds never take off; warmup/budget/CLF levers all measured negative —
# the spawn curriculum is the untried lever).
#
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
# Usage: bash scripts/quad_curriculum_sweep.sh [curriculum_episodes]
set -u
cd "$(dirname "$0")/.."
CURR=${1:-120}
OUT=results/r3/quad_curriculum_c${CURR}
mkdir -p "$OUT"
for SEED in 1 2 3 7 12345; do
  echo "=== seed $SEED (curriculum $CURR) ==="
  timeout 2400 python train.py --preset quadrotor \
    --spawn_curriculum_episodes "$CURR" --seed "$SEED" \
    --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && echo "seed $SEED rc=$rc (see $OUT/s${SEED}.log)"
  tail -3 "$OUT/s${SEED}.log" || true
done
echo "sweep done"
