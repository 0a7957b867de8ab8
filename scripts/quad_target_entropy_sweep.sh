#!/usr/bin/env bash
# Quadrotor TARGET-ENTROPY sweep (7th take-off lever).
#
# Mechanism targeted (PARITY.md "Quadrotor"): every quadrotor run ratchets
# its entropy temperature (alpha 0.2 -> 8-140) because the SAC target
# entropy -dim(A) = -2 nats is calibrated for ~unit action scales: the
# tanh-squash log-prob correction adds sum(log scale_i) to the policy
# entropy, which is +3.7/+4.0 nats on unicycle/pvtol (alpha healthy) but
# -0.6 on the quadrotor's +/-30%-hover range — useful policies sit
# permanently BELOW the target and the ascent never stops.  Unlike fixed
# alpha (lever 6, negative: under-explores), a recalibrated target keeps
# the temperature ADAPTIVE — alpha still rises while the policy is more
# concentrated than the target, but now falls back once it isn't.
#
# Values: -2.616 = -dim(A) + sum(log scale) (the reference's target
# expressed in the UNIT tanh space); -4.0 = a more permissive probe.
# Both paired with --kill_penalty 250 (lever 5: the only lever that
# removes the 34-step suicide optimum).
set -u
cd "$(dirname "$0")/.."
EPS=${1:-210}
for TE in -2.616 -4.0; do
  OUT=results/r4/quad_te${TE}_p250_e${EPS}
  mkdir -p "$OUT"
  for SEED in 12345 3 2 1 7; do
    echo "=== target_entropy $TE seed $SEED ($EPS eps) ==="
    timeout 4200 python train.py --preset quadrotor \
      --kill_penalty 250 --target_entropy "$TE" \
      --max_episodes "$EPS" --seed "$SEED" \
      --output "$OUT/s${SEED}" --quiet \
      > "$OUT/s${SEED}.log" 2>&1
    rc=$?
    [ $rc -ne 0 ] && echo "seed $SEED rc=$rc (see $OUT/s${SEED}.log)"
    tail -3 "$OUT/s${SEED}.log" || true
  done
done
echo "sweep done"
