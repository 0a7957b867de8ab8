#!/usr/bin/env bash
# Lever-14 grid (r7): cross the best retention recipe (arm K: anneal
# 210 + stationary uniform mix) with the constraint schedule.  All of
# levers 9-13 ran warmup 60 + rho_max 20, which arm H measured as
# under-penalizing the ground-start suicide dive; the shipped preset's
# rho<=50 is the only configuration with durable ORGANIC ground
# flight (27/30 at ep 400, s12345).  400-ep runs: the mix arms were
# still scoring at ep 300, and organic ground competence historically
# appears late.
#   N: curr 210 + mix, warmup 60, rho_max 50 — stronger ratchet under
#      mix retention: lever-10's arm B died in the rho 29->50 window,
#      but that was under ground-only post-anneal spawns.
#   O: curr 210 + mix, rho_max 20 (arm-K config), 400 eps — control
#      for the longer budget: does ground skill emerge with time?
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
OUTN=results/r7/quad_armN_mixrho50
OUTO=results/r7/quad_armO_mix400
mkdir -p "$OUTN" "$OUTO"
for SEED in 1 12345; do
  echo "=== arm N (curr210 mix + warm60 + rho50, 400 eps) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 50 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUTN/s${SEED}" --quiet \
    > "$OUTN/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTN/s${SEED}.log" || true
done
for SEED in 1 12345; do
  echo "=== arm O (curr210 mix + warm60 + rho20, 400 eps) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUTO/s${SEED}" --quiet \
    > "$OUTO/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUTO/s${SEED}.log" || true
done
echo "lever14 grid done"
