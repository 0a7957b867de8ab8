#!/usr/bin/env bash
# r5 follow-up: the post-bf3e624 trajectory shift moved quadrotor
# take-off basins — seed 12345 no longer sustains goals at ANY probed
# target entropy (-3/-4/-5/-6). Scan seeds at the shipped preset
# (TE=-4, kill_penalty=250) to find which seeds land in the take-off
# basin under the new (reference-faithful) first-update temperature.
set -u
cd "$(dirname "$0")/.."
if [ -f /tmp/r5_queue.pid ]; then
  tail --pid="$(cat /tmp/r5_queue.pid)" -f /dev/null || true
fi
OUT=results/r5/quad_seedscan_te-4_p250_e210
mkdir -p "$OUT"
for SEED in 1 2 3 5 7 42 99; do
  echo "=== preset recipe seed $SEED (210 eps) ==="
  timeout 4200 python train.py --preset quadrotor \
    --max_episodes 210 --seed "$SEED" \
    --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1 || echo "seed $SEED rc=$?"
  tail -2 "$OUT/s${SEED}.log" || true
done
echo "seedscan done"
