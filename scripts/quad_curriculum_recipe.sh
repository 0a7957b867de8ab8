#!/usr/bin/env bash
# Lever 9: reverse-spawn curriculum COMBINED with the r5 retention
# recipe (kill_penalty=250 + TE=-6 + rho_max=50, now preset defaults).
#
# Rationale (PARITY.md "Quadrotor"): the r3 curriculum sweep measured
# negative, but its failure signature was RETENTION (goals earned only
# while spawns were elevated, then lost) — and it ran before the kill
# penalty (r4), the temperature-parity fix (bf3e624), TE=-6 and the
# rho cap (r5) existed.  Post-r5 the working seed's retention is fixed
# (rho_max=50 keeps the quadratic penalty in the survivable band) and
# the remaining multi-seed blocker is goal DISCOVERY, which is exactly
# what the curriculum provides.  The combination is untested.
#
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
CURR=${1:-120}
OUT=results/r6/quad_curr${CURR}_recipe
mkdir -p "$OUT"
for SEED in 1 2 3 7 99 12345; do
  echo "=== curriculum $CURR + r5 recipe, seed $SEED (210 eps) ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes "$CURR" \
    --max_episodes 210 --seed "$SEED" \
    --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -2 "$OUT/s${SEED}.log" || true
done
echo "curriculum+recipe sweep done"
