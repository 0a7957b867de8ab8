#!/usr/bin/env bash
# Lever-8 confirmation: rho_max=50 + TE=-6 produced the first durable
# POST-parity-fix take-off (seed 12345: 100% goal rate eps 150-210
# after a transitional dip while the Lyapunov critic re-fits). Probe
# the historically-never-taken-off seeds (1/2/3 have 0 sustained goals
# under EVERY configuration ever measured, pre- and post-fix) plus a
# 400-episode durability run for the working seed.
set -u
cd "$(dirname "$0")/.."
if [ -f /tmp/r5_uni.pid ]; then
  tail --pid="$(cat /tmp/r5_uni.pid)" -f /dev/null || true
fi
OUT=results/r5/quad_rhocap50_te-6.0
mkdir -p "$OUT"
for SEED in 1 2 3 5 7 99; do
  echo "=== rho_max 50 TE -6 seed $SEED (210 eps) ==="
  timeout 4200 python train.py --preset quadrotor \
    --rho_max 50 --target_entropy -6.0 \
    --max_episodes 210 --seed "$SEED" \
    --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -2 "$OUT/s${SEED}.log" || true
done
echo "=== rho_max 50 TE -6 seed 12345 DURABILITY (400 eps) ==="
OUT400=results/r5/quad_rhocap50_te-6.0_e400
mkdir -p "$OUT400"
timeout 4200 python train.py --preset quadrotor \
  --rho_max 50 --target_entropy -6.0 \
  --max_episodes 400 --seed 12345 \
  --output "$OUT400/s12345" --quiet \
  > "$OUT400/s12345.log" 2>&1 || echo "rc=$?"
tail -2 "$OUT400/s12345.log" || true
echo "multiseed done"
