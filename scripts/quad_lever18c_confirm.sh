#!/usr/bin/env bash
# Lever-18c (r7): probe-reg CONFIRMATION. The 18b dose grid found a
# clean dose-response (scripts/quad_saturation_probe.py): c=0.1 leaves
# the probe saturated (|mu|max 4.6), c=1 partial (2.7), c=10 fully
# linear (0.665, gf 0.66) — and c=10 is the ONLY arm in 18 levers with
# true ground-start goals at scale (32/64 vs best-ever 7/60). Two arms:
#  - c=10 seed 12345 (the weaker seed): does the recipe generalize?
#  - c=3 seed 1: the knee — c=10 fixed ground starts but lost mid-run
#    windows (totals 219 vs 238 @0.1); does a mid dose keep both?
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
run() {
  local C=$1 SEED=$2
  local OUT=results/r7/quad_armY_probereg_c${C}_s${SEED}
  mkdir -p "$OUT"
  echo "=== arm Y (probe reg $C) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --kill_attitude 2.5 --probe_pretanh_reg "$C" \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUT/s$SEED" --quiet \
    > "$OUT/s$SEED.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUT/s$SEED.log" || true
}
run 10.0 12345
run 3.0 1
echo "lever18c confirm done"
