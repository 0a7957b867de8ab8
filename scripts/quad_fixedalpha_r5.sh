#!/usr/bin/env bash
# Quadrotor TRUE fixed-alpha sweep (post bf3e624).
#
# The r3 fixed-alpha sweep silently ran alpha=1.0: before 59e89e1 the
# tuning-off path ignored alpha_init and used exp(log_alpha=0). With the
# fix, --automatic_entropy_tuning false --alpha A really runs constant A.
# A small constant alpha removes the entropy-temperature ratchet (the
# failure signature of every non-take-off seed, incl. seed 12345 after
# the first-update temperature parity change shifted its trajectory) by
# construction — this lever has never actually been measured.
#
# Usage: quad_fixedalpha_r5.sh [ALPHA] [EPS] [SEEDS...]
set -u
cd "$(dirname "$0")/.."
ALPHA=${1:-0.2}
EPS=${2:-210}
shift 2 2>/dev/null || true
SEEDS=${*:-"12345 1 2 3"}
OUT=results/r5/quad_fixedalpha_a${ALPHA}_e${EPS}
mkdir -p "$OUT"
for SEED in $SEEDS; do
  echo "=== seed $SEED (fixed alpha=$ALPHA, $EPS eps) ==="
  timeout 4200 python train.py --preset quadrotor \
    --automatic_entropy_tuning false --alpha "$ALPHA" \
    --max_episodes "$EPS" --seed "$SEED" \
    --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && echo "seed $SEED rc=$rc (see $OUT/s${SEED}.log)"
  tail -3 "$OUT/s${SEED}.log" || true
done
echo "sweep done"
