#!/usr/bin/env bash
# Lever-19 (r8): CHARACTERIZE the c=10 probe-reg recipe across seeds.
#
# 18c refuted single-dose generalization (s1 32/64 ground starts,
# s12345 1/64) and the Q-landscape probe (quad_ground_q_probe.py)
# showed the failing seed's critic is flat-and-pessimistic at the
# ground (Q ~ -320, 6-point action spread) while the succeeding one is
# steep (Q ~ -140, 80-point spread, dQ/d(climb) +27): the policy
# faithfully follows whichever critic its run produced, and the
# divergence is a GLOBAL mid-run destabilization (failing run: policy
# loss flips positive at the anneal end, ep ~200; succeeding: ep ~320).
# No remaining single knob is implicated (alpha did NOT ratchet in the
# failing run; lambda_max saturation coexists with goal flourishing in
# r5 diagnostics), so this lever measures the recipe's seed
# distribution at n=4 instead of adding knob #15.
#
# Arms: seeds 7 and 42 on the full recipe (mix 210 + warmup 60 +
# rho_max 20 + attitude-kill 2.5 + probe-reg 10). Sequential — never
# queue two processes on the axon tunnel.
set -u
cd "$(dirname "$0")/.."
run() {
  local SEED=$1
  local OUT=results/r8/quad_armZ_charac_c10_s${SEED}
  mkdir -p "$OUT"
  echo "=== arm Z (c=10 characterization) seed $SEED ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --kill_attitude 2.5 --probe_pretanh_reg 10.0 \
    --max_episodes 400 --seed "$SEED" \
    --output "$OUT/s$SEED" --quiet \
    > "$OUT/s$SEED.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUT/s$SEED.log" || true
}
run 7
run 42
echo "lever19 characterization done"
