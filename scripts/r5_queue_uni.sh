#!/usr/bin/env bash
# r5 batch: unicycle post-parity-fix seed bracket. The seed-12345
# revalidation landed at last-50 reward 525.9 / goal 46/50 — far below
# the PRE-fix 4-seed band (691 +/- 1.7, 100/100 goals). Measure seeds
# 1/7/42 under the new semantics to tell butterfly variance from a
# systematic shift.
set -u
cd "$(dirname "$0")/.."
if [ -f /tmp/r5_rhocap.pid ]; then
  tail --pid="$(cat /tmp/r5_rhocap.pid)" -f /dev/null || true
fi
OUT=results/r5/uni_reval
mkdir -p "$OUT"
for SEED in 1 7 42; do
  echo "=== unicycle seed $SEED (200 eps) ==="
  timeout 4200 python train.py --preset unicycle \
    --seed "$SEED" --output "$OUT/s${SEED}" --quiet \
    > "$OUT/s${SEED}.log" 2>&1 || echo "rc=$?"
  tail -2 "$OUT/s${SEED}.log" || true
done
echo "uni reval done"
