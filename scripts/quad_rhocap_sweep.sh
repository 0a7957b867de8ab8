#!/usr/bin/env bash
# Quadrotor lever 8: cap the augmented-penalty coefficient rho.
#
# The r5 instrumented TE=-6 run (results/r5/quad_te-6_diag, rho/lam_max
# columns) shows goals flourish eps 30-75 while rho is 2.5-51 and die
# exactly as rho ratchets 51->200 (its cap) — with alpha BOUNDED at 2.8
# and lam_max pinned at 400 since ep 30 (i.e. goals coexist with
# saturated lambda). The retention killer is the quadratic rho*c^2 term
# coming to dominate the policy loss. An early (r1, pre-fit-gate,
# pre-kill-penalty) lambda_max=rho_max=20 clamp "did not stabilize"
# the old collapse, but that predates every component of the current
# recipe; this retests the rho cap alone on top of it.
#
# Usage: quad_rhocap_sweep.sh [SEEDS...]   (arms: rho_max x TE below)
set -u
cd "$(dirname "$0")/.."
if [ -f /tmp/r5_te6.pid ]; then
  tail --pid="$(cat /tmp/r5_te6.pid)" -f /dev/null || true
fi
SEEDS=${*:-12345}
for RMAX in 50 20; do
  for TE in -4.0 -6.0; do
    OUT=results/r5/quad_rhocap${RMAX}_te${TE}
    mkdir -p "$OUT"
    for SEED in $SEEDS; do
      echo "=== rho_max $RMAX TE $TE seed $SEED (210 eps) ==="
      timeout 4200 python train.py --preset quadrotor \
        --rho_max "$RMAX" --target_entropy "$TE" \
        --max_episodes 210 --seed "$SEED" \
        --output "$OUT/s${SEED}" --quiet \
        > "$OUT/s${SEED}.log" 2>&1 || echo "rc=$?"
      tail -2 "$OUT/s${SEED}.log" || true
    done
  done
done
echo "rhocap sweep done"
