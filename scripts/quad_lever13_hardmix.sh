#!/usr/bin/env bash
# Lever-13 grid (r7): bias the stationary post-anneal mixture toward
# the hard near-ground band.  Lever-12 finding: under the uniform
# mixture the alpha~0.9-1 band gets ~12% of episodes and ground-start
# skill decays to kill-box crashes despite exact-ground rehearsal
# every 3rd episode (failed rehearsal generates no goal data).
#   L: mix_alpha_min 0.6  — moderate hard-bias; keeps some mid spawns
#   M: mix_alpha_min 0.85 — near-ground-only rehearsal; if elevated
#      retention ALSO dies here, the easy-spawn successes were the
#      load-bearing data and the mixture needs both ends
# Both: curriculum 120 + mix + warmup 60 + rho_max 20 (arm-I base so
# the only variable vs lever 12 is the mixture bound), 300 eps.
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
OUTL=results/r7/quad_armL_mix60
OUTM=results/r7/quad_armM_mix85
mkdir -p "$OUTL" "$OUTM"
for SEED in 1 12345; do
  echo "=== arm L (mix120 alpha_min 0.6) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 120 --spawn_curriculum_mode mix \
    --spawn_mix_alpha_min 0.6 \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --max_episodes 300 --seed "$SEED" \
    --output "$OUTL/s${SEED}" --quiet \
    > "$OUTL/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTL/s${SEED}.log" || true
done
for SEED in 1 12345; do
  echo "=== arm M (mix120 alpha_min 0.85) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 120 --spawn_curriculum_mode mix \
    --spawn_mix_alpha_min 0.85 \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --max_episodes 300 --seed "$SEED" \
    --output "$OUTM/s${SEED}" --quiet \
    > "$OUTM/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTM/s${SEED}.log" || true
done
echo "lever13 grid done"
