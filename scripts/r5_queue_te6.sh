#!/usr/bin/env bash
# r5 batch 3: TE=-6 probe. Post-bf3e624, TE=-6 is the strongest
# seed-12345 arm (14 goals eps 30-90, alpha BOUNDED at 2.8) but loses
# retention — goals vanish by ep 90 despite a tame temperature, so the
# blocker has moved from exploration to retention. Rerun s12345 (same
# trajectory, now with the rho/lam_max progress columns) to see whether
# the augmented-Lagrangian multipliers ratchet when goals disappear,
# and probe two more seeds for durability.
set -u
cd "$(dirname "$0")/.."
if [ -f /tmp/r5_seedscan.pid ]; then
  tail --pid="$(cat /tmp/r5_seedscan.pid)" -f /dev/null || true
fi
OUT=results/r5/quad_te-6_diag
mkdir -p "$OUT"
for SEED in 12345 2 5; do
  echo "=== TE=-6 seed $SEED (210 eps) ==="
  timeout 4200 python train.py --preset quadrotor \
    --target_entropy -6.0 \
    --max_episodes 210 --seed "$SEED" \
    --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1 || echo "seed $SEED rc=$?"
  tail -2 "$OUT/s${SEED}.log" || true
done
echo "te6 done"
