#!/usr/bin/env bash
# Lever-17 grid (r7): ground-start cadence from EPISODE 0 (mix_early).
# The plain curriculum excludes ground states from the random-warmup /
# high-entropy phase; the one configuration with organic ground
# take-off (shipped preset, s12345) acquired it exactly from early
# exploration.  mix_early restores early ground exposure while keeping
# the anneal's goal-gradient and the mix's retention.
#   T: arm-Q base + mix_early (kill_attitude 2.5)
#   U: arm-O base + mix_early (no attitude kill) — separates the two
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
OUTT=results/r7/quad_armT_mixearly_att
OUTU=results/r7/quad_armU_mixearly
mkdir -p "$OUTT" "$OUTU"
for SEED in 1 12345; do
  echo "=== arm T (mix_early + kill_att 2.5) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix_early \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --kill_attitude 2.5 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUTT/s${SEED}" --quiet \
    > "$OUTT/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTT/s${SEED}.log" || true
done
for SEED in 1 12345; do
  echo "=== arm U (mix_early, no attitude kill) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix_early \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUTU/s${SEED}" --quiet \
    > "$OUTU/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTU/s${SEED}.log" || true
done
echo "lever17 grid done"
