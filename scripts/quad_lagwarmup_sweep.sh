#!/usr/bin/env bash
# Lever 10: --lagrangian_warmup_episodes on top of the r5 recipe
# (kill_penalty=250 + TE=-6 + rho_max=50, preset defaults).
#
# Motivation (r6 diagnostic, results/r6/quad_curr120_recipe): all four
# failing seeds earn goals from elevated spawns, then die with
# lambda_max saturated at 400 by ~ep 25 and rho pinned at its 50 cap by
# ~ep 55 — the schedule ratchets faster than the policy learns.  Arm A
# freezes the schedule for the first 60 episodes; arm B additionally
# keeps the reverse-spawn curriculum so goal DISCOVERY is guaranteed
# while the schedule is frozen.
#
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
WARM=${1:-60}
OUT=results/r6/quad_lagwarm${WARM}
mkdir -p "$OUT"
for SEED in 1 2 3 12345; do
  echo "=== lagwarm $WARM seed $SEED (210 eps) ==="
  timeout 4200 python train.py --preset quadrotor \
    --lagrangian_warmup_episodes "$WARM" \
    --max_episodes 210 --seed "$SEED" \
    --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -2 "$OUT/s${SEED}.log" || true
done
OUTB=results/r6/quad_lagwarm${WARM}_curr120
mkdir -p "$OUTB"
for SEED in 1 2 3 12345; do
  echo "=== lagwarm $WARM + curriculum 120 seed $SEED (210 eps) ==="
  timeout 4200 python train.py --preset quadrotor \
    --lagrangian_warmup_episodes "$WARM" \
    --spawn_curriculum_episodes 120 \
    --max_episodes 210 --seed "$SEED" \
    --output "$OUTB/s${SEED}" --quiet \
    > "$OUTB/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -2 "$OUTB/s${SEED}.log" || true
done
echo "lagwarm sweep done"
