#!/usr/bin/env bash
# Quadrotor kill-penalty sweep (5th take-off lever, PARITY.md "Quadrotor").
#
# Diagnosis (results/r3/quad_curriculum_*): failing seeds converge to a
# SUICIDE policy — every episode terminates at exactly 34 steps in the
# ground kill box, because with reward = -dist a fast crash (~ -65 total)
# strictly beats hovering (~ -190 discounted) and only goal discovery
# (+250) beats crashing. A terminal crash penalty >= ~135 reorders crash
# below hover so the dense -dist gradient can act.
#
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
# Usage: bash scripts/quad_killpen_sweep.sh [penalty]
set -u
cd "$(dirname "$0")/.."
PEN=${1:-250}
OUT=results/r3/quad_killpen_p${PEN}
mkdir -p "$OUT"
for SEED in 1 2 3 7 12345; do
  echo "=== seed $SEED (kill_penalty $PEN) ==="
  timeout 2400 python train.py --preset quadrotor \
    --kill_penalty "$PEN" --seed "$SEED" \
    --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && echo "seed $SEED rc=$rc (see $OUT/s${SEED}.log)"
  tail -3 "$OUT/s${SEED}.log" || true
done
echo "sweep done"
