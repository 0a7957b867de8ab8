#!/usr/bin/env bash
# Lever-15 grid (r7): attitude-kill termination under the best
# retention recipe.  Diagnosis (PARITY r7): the learned behavior
# family is ballistic tumble-throws (|theta| passes 3 rad even on
# successful flights) which fail exactly at the ground start; nothing
# in the env opposes attitude divergence.  With kill_penalty=250
# (preset) every tumble onset becomes an immediate terminal -250.
#   P: kill_attitude pi/2 (1.5708) — safe-control-gym-like strictness;
#      also kills today's successful tumble-flights, forcing the
#      policy to relearn upright flight from scratch.
#   Q: kill_attitude 2.5 — kills somersaults, allows aggressive
#      banking; smaller change to the current success mode.
# Both: arm-O base (curr 210 + mix + warmup 60 + rho_max 20, 400 eps).
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
OUTP=results/r7/quad_armP_att157
OUTQ=results/r7/quad_armQ_att250
mkdir -p "$OUTP" "$OUTQ"
for SEED in 1 12345; do
  echo "=== arm P (mix210 + kill_attitude 1.5708) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --kill_attitude 1.5708 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUTP/s${SEED}" --quiet \
    > "$OUTP/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTP/s${SEED}.log" || true
done
for SEED in 1 12345; do
  echo "=== arm Q (mix210 + kill_attitude 2.5) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --kill_attitude 2.5 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUTQ/s${SEED}" --quiet \
    > "$OUTQ/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTQ/s${SEED}.log" || true
done
echo "lever15 grid done"
