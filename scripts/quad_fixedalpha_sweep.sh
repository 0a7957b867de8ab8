#!/usr/bin/env bash
# Quadrotor kill-penalty + FIXED-ALPHA sweep (6th take-off lever).
#
# Every quadrotor run diverges its entropy temperature (alpha 0.2 -> 8-37
# by ep 210; 140 at ep 500) regardless of outcome: the narrow +/-30%-hover
# action range makes the SAC target entropy (-dim(A) = -2 nats) demand a
# concentrated policy, while the growing augmented-Lagrangian term pins
# the policy against it — alpha ratchets until the entropy bonus swamps
# the Q term. Fixed alpha=0.2 (tuning off) removes the ratchet; paired
# with kill_penalty=250 (which removes the suicide optimum).
set -u
cd "$(dirname "$0")/.."
PEN=${1:-250}
EPS=${2:-210}
OUT=results/r3/quad_fixedalpha_p${PEN}_e${EPS}
mkdir -p "$OUT"
for SEED in 12345 3 2 1 7; do
  echo "=== seed $SEED (kill_penalty $PEN, fixed alpha, $EPS eps) ==="
  timeout 4200 python train.py --preset quadrotor \
    --kill_penalty "$PEN" --automatic_entropy_tuning false \
    --max_episodes "$EPS" --seed "$SEED" \
    --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && echo "seed $SEED rc=$rc (see $OUT/s${SEED}.log)"
  tail -3 "$OUT/s${SEED}.log" || true
done
echo "sweep done"
