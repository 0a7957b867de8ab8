#!/usr/bin/env bash
# Lever-10 follow-up grid (r6). The arm-B diagnostic (lagwarm60 +
# curr120, seed 1) shows goals surviving lambda saturation but dying
# exactly in the rho 45->50 window — and rho=50 never actually makes
# the policy safe (cost stays ~15/ep after goal death).  Two arms:
#   C: curriculum + schedule frozen for the WHOLE run (warmup 210) —
#      diagnostic: is any ratchet tolerable, and does the base
#      (rho=1, lam=0) quadratic alone reduce violations?
#   D: curriculum + warmup 60 + rho_max 20 — keep the post-warmup
#      ratchet inside the band where arm-B goals survived.
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
OUTC=results/r6/quad_currC_frozen
OUTD=results/r6/quad_currD_rho20
mkdir -p "$OUTC" "$OUTD"
for SEED in 1 2 3 12345; do
  echo "=== arm C (curr120 + lagwarm210) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 120 \
    --lagrangian_warmup_episodes 210 \
    --max_episodes 210 --seed "$SEED" \
    --output "$OUTC/s${SEED}" --quiet \
    > "$OUTC/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -2 "$OUTC/s${SEED}.log" || true
done
for SEED in 1 2 3 12345; do
  echo "=== arm D (curr120 + lagwarm60 + rho_max 20) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 120 \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --max_episodes 210 --seed "$SEED" \
    --output "$OUTD/s${SEED}" --quiet \
    > "$OUTD/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -2 "$OUTD/s${SEED}.log" || true
done
echo "grid2 done"
