#!/usr/bin/env bash
# Lever-16 grid (r7): unstick the ground-state tanh saturation under
# the best recipe so far (arm Q: curr 210 + mix + warmup 60 + rho 20 +
# kill_attitude 2.5 — 233 goals/400 eps on s1 with last-30 cost 0.3,
# but ground starts 0/64: the policy mean is pinned at the action
# corner, |pre-tanh mean| 2-6, gradient ~5e-5).
#   R: + pretanh_reg 1e-3 — the original SAC pre-activation
#      regularizer; keeps the mean in the responsive band so the
#      attitude-kill penalties can actually steer it.
#   S: + target_entropy -2 (-dim(A), reference default) — the r5
#      TE=-6 recipe predates mix/attitude-kill and permits the
#      near-deterministic saturated policy; a higher entropy floor
#      keeps exploration alive at the ground state.
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
OUTR=results/r7/quad_armR_reg
OUTS=results/r7/quad_armS_te2
mkdir -p "$OUTR" "$OUTS"
for SEED in 1 12345; do
  echo "=== arm R (armQ + pretanh_reg 1e-3) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --kill_attitude 2.5 --pretanh_reg 0.001 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUTR/s${SEED}" --quiet \
    > "$OUTR/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTR/s${SEED}.log" || true
done
for SEED in 1 12345; do
  echo "=== arm S (armQ + target_entropy -2) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --kill_attitude 2.5 --target_entropy -2 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUTS/s${SEED}" --quiet \
    > "$OUTS/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTS/s${SEED}.log" || true
done
echo "lever16 grid done"
