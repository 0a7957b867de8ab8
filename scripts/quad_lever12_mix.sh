#!/usr/bin/env bash
# Lever-12 grid (r7): test the stationary mixed-spawn distribution
# against the lever-11 synthesis (the policy forgets spawn heights it
# no longer rehearses; an anneal that ENDS is a moving target
# terminating at the hardest task).  All arms run 300 episodes — far
# past every previous collapse window (eps 120-150 for B/C/D; arm E
# declined as its 210-ep anneal neared the ground).
#   I: curriculum 120 + mix   — the lever-12 hypothesis at the grid2
#      window: does permanent rehearsal (ground start every 3rd ep,
#      alpha~U(0.15,1) otherwise) hold goals where B/C/D collapsed?
#   J: curriculum 210, anneal — arm-E control extended 90 eps past its
#      anneal end: if it collapses in eps ~210-240 the lever-11
#      "tracks spawn height" synthesis is confirmed on schedule.
#   K: curriculum 210 + mix   — the combination candidate: arm E's
#      slow ramp (its 126/134 goals) plus permanent rehearsal after.
# All arms keep warmup 60 + rho_max 20 (constant across B-H, so ρ is
# controlled for).  Runs SEQUENTIALLY (never queue two processes on
# the axon tunnel).
set -u
cd "$(dirname "$0")/.."
OUTI=results/r7/quad_armI_mix120
OUTJ=results/r7/quad_armJ_curr210x300
OUTK=results/r7/quad_armK_mix210
mkdir -p "$OUTI" "$OUTJ" "$OUTK"
for SEED in 1 12345; do
  echo "=== arm I (curr120 mix + warm60 + rho20, 300 eps) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 120 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --max_episodes 300 --seed "$SEED" \
    --output "$OUTI/s${SEED}" --quiet \
    > "$OUTI/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTI/s${SEED}.log" || true
done
for SEED in 1 12345; do
  echo "=== arm J (curr210 anneal + warm60 + rho20, 300 eps) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --max_episodes 300 --seed "$SEED" \
    --output "$OUTJ/s${SEED}" --quiet \
    > "$OUTJ/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTJ/s${SEED}.log" || true
done
for SEED in 1 12345; do
  echo "=== arm K (curr210 mix + warm60 + rho20, 300 eps) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --max_episodes 300 --seed "$SEED" \
    --output "$OUTK/s${SEED}" --quiet \
    > "$OUTK/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTK/s${SEED}.log" || true
done
echo "lever12 grid done"
