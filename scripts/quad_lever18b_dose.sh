#!/usr/bin/env bash
# Lever-18b (r7): probe-reg DOSE-RESPONSE. The 1e-3/1e-2 arms left the
# probe states MORE saturated than unregularized (|mu| 17.5 vs 9.0 —
# scripts/quad_saturation_probe.py): the mu^2 pull (grad ~ 2*mu*c/26)
# flows through the SAME shared trunk as task gradients of order ~1, so
# sub-0.1 coefficients are invisible. Doses 0.1 / 1 / 10 on arm-Q base,
# seed 1 (the stronger seed) for the scan; the winner gets s12345.
# Runs SEQUENTIALLY (never queue two processes on the axon tunnel).
set -u
cd "$(dirname "$0")/.."
for C in 0.1 1.0 10.0; do
  OUT=results/r7/quad_armX_probereg_c${C}
  mkdir -p "$OUT"
  echo "=== arm X (probe reg $C) seed 1 ==="
  timeout 4200 python train.py --preset quadrotor \
    --spawn_curriculum_episodes 210 --spawn_curriculum_mode mix \
    --lagrangian_warmup_episodes 60 --rho_max 20 \
    --kill_attitude 2.5 --probe_pretanh_reg "$C" \
    --max_episodes 400 --seed 1 \
    --output "$OUT/s1" --quiet \
    > "$OUT/s1.log" 2>&1 || echo "rc=$?"
  tail -n 2 "$OUT/s1.log" || true
done
echo "lever18b dose grid done"
