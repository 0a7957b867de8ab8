#!/usr/bin/env bash
# Lever-18 grid (r7): probe-targeted pre-tanh regularizer.
# Lever 15 pinned the ground-start failure on a tanh-saturation trap at
# the spawn obs; lever 16 (replay-averaged mu^2 reg) failed to
# de-saturate it (ground obs are a sliver of the batch); lever 17
# (early ground data) poisoned the curriculum. probe_pretanh_reg
# evaluates the mu^2 pull on a FIXED batch of ground-spawn-region
# observations every policy update, so the de-saturation pressure lands
# exactly at the trap regardless of replay composition.
#   V: arm-Q base + probe reg 1e-3
#   W: arm-Q base + probe reg 1e-2 (dose check)
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
OUTV=results/r7/quad_armV_probereg3
OUTW=results/r7/quad_armW_probereg2
mkdir -p "$OUTV" "$OUTW"
for SEED in 1 12345; do
  echo "=== arm V (probe reg 1e-3) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --kill_attitude 2.5 --probe_pretanh_reg 1e-3 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUTV/s${SEED}" --quiet \
    > "$OUTV/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTV/s${SEED}.log" || true
done
for SEED in 1 12345; do
  echo "=== arm W (probe reg 1e-2) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --kill_attitude 2.5 --probe_pretanh_reg 1e-2 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUTW/s${SEED}" --quiet \
    > "$OUTW/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTW/s${SEED}.log" || true
done
echo "lever18 grid done"
