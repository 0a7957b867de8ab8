#!/usr/bin/env bash
# Kill-penalty long-budget follow-up: 400 episodes, all 5 seeds, p=250.
# The 210-ep sweep (results/r3/quad_killpen_p250) showed late take-off in
# 3/5 seeds (first goals at eps 95-195, still climbing at budget end).
set -u
cd "$(dirname "$0")/.."
OUT=results/r3/quad_killpen_p250_e400
mkdir -p "$OUT"
for SEED in 3 12345 2 1 7; do
  echo "=== seed $SEED (kill_penalty 250, 400 eps) ==="
  timeout 4200 python train.py --preset quadrotor \
    --kill_penalty 250 --max_episodes 400 --seed "$SEED" \
    --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && echo "seed $SEED rc=$rc (see $OUT/s${SEED}.log)"
  tail -3 "$OUT/s${SEED}.log" || true
done
echo "sweep done"
