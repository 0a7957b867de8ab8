#!/usr/bin/env bash
# Arm-D confirmation (r7): if curriculum 120 + lagrangian warmup 60 +
# rho_max 20 retains goals on the grid2 seeds, this extends the
# evidence on both axes:
#   - breadth: three unseen seeds (5, 7, 99) at 210 eps
#   - durability: seeds 1 and 12345 at the full 400-ep budget
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
OUT=results/r7/quad_recipeD
mkdir -p "$OUT"
for SEED in 5 7 99; do
  echo "=== recipe D breadth seed $SEED (210 eps) ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 120 \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --max_episodes 210 --seed "$SEED" \
    --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUT/s${SEED}.log" || true
done
for SEED in 1 12345; do
  echo "=== recipe D durability seed $SEED (400 eps) ==="
  timeout 6000 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 120 \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUT/s${SEED}_e400" --quiet \
    > "$OUT/s${SEED}_e400.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUT/s${SEED}_e400.log" || true
done
echo "recipeD confirm done"
