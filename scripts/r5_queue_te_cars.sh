#!/usr/bin/env bash
# r5 serialized TPU queue (one process at a time on the axon tunnel):
# 1. wait for the fixed-alpha sweep (pid file) to finish
# 2. target-entropy re-probe for quadrotor seed 12345 under the
#    post-bf3e624 (first-update temperature parity) semantics — the r4
#    TE table is trajectory-invalidated; TE=-4.0 @210 is already covered
#    by results/r4/revalidate/quadrotor (2 transient goals, alpha->10.4)
# 3. cars seeds 1 and 7 under the new semantics (pre-fix: 161/250
#    last-50 reward, zero late violations) to bracket the seed-12345
#    revalidation outcome (116.5, 23 late violation-episodes)
set -u
cd "$(dirname "$0")/.."
if [ -f /tmp/quad_fa02.pid ]; then
  tail --pid="$(cat /tmp/quad_fa02.pid)" -f /dev/null || true
fi
for TE in -3.0 -5.0 -6.0; do
  OUT=results/r5/quad_te${TE}_p250_e210
  mkdir -p "$OUT"
  echo "=== target_entropy $TE seed 12345 (210 eps) ==="
  timeout 4200 python train.py --preset quadrotor \
    --target_entropy "$TE" \
    --max_episodes 210 --seed 12345 \
    --output "$OUT/s12345" --quiet \
    > "$OUT/s12345.log" 2>&1 || echo "TE $TE rc=$?"
  tail -2 "$OUT/s12345.log" || true
done
for SEED in 1 7; do
  OUT=results/r5/cars_reval
  mkdir -p "$OUT"
  echo "=== cars seed $SEED (200 eps) ==="
  timeout 4200 python train.py --preset cars \
    --seed "$SEED" --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1 || echo "cars $SEED rc=$?"
  tail -2 "$OUT/s${SEED}.log" || true
done
echo "queue done"
