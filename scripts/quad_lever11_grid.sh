#!/usr/bin/env bash
# Lever-11 grid (r7): decouple the two post-curriculum collapse
# hypotheses left open by grid2 (arms B/C/D all die in eps 120-150
# regardless of rho; arm-B seed-1 scores ground-start goals at ep 124
# then loses the skill within 30 eps — forgetting, not inability):
#   E: slower ramp  — curriculum 210 (alpha<1 for the whole run),
#      warmup 60, rho_max 20.  If goals persist past ep 150 the
#      collapse tracks the anneal completing, not wall-clock.
#   F: unfreeze NODE — recipe D + fit_episode_limit 210.  The preset
#      gates NODE fits at ep 100, so the frozen dynamics model mostly
#      saw elevated-spawn data and never ground-start take-off; the
#      CBF/CLF constraints may mis-shape the policy near the ground.
#   H: no curriculum — warmup 60 + rho_max 20 on seed 12345 (the one
#      organic ground-start seed): does the gentler schedule help or
#      hurt where take-off already works?
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
OUTE=results/r7/quad_armE_curr210
OUTF=results/r7/quad_armF_nodefit
OUTH=results/r7/quad_armH_nocurr
mkdir -p "$OUTE" "$OUTF" "$OUTH"
for SEED in 1 12345; do
  echo "=== arm E (curr210 + warm60 + rho20) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --max_episodes 210 --seed "$SEED" \
    --output "$OUTE/s${SEED}" --quiet \
    > "$OUTE/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTE/s${SEED}.log" || true
done
for SEED in 1 12345; do
  echo "=== arm F (recipe D + NODE fit whole run) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 120 \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --NODE_fit_episode_limit 210 \
    --max_episodes 210 --seed "$SEED" \
    --output "$OUTF/s${SEED}" --quiet \
    > "$OUTF/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTF/s${SEED}.log" || true
done
echo "=== arm H (warm60 + rho20, NO curriculum) seed 12345 ==="
timeout 4200 python train.py --preset quadrotor \
  --lagrangian_warmup_episodes 60 --rho_max 20 \
  --max_episodes 210 --seed 12345 \
  --output "$OUTH/s12345" --quiet \
  > "$OUTH/s12345.log" 2>&1 || echo "rc=$?"
tail -n 2 "$OUTH/s12345.log" || true
echo "lever11 grid done"
