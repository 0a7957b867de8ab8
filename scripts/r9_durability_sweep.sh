#!/bin/bash
# r9: durability BEYOND the reference budgets, 4 seeds per preset.
#
# The reference's own README curves stop at its budgets (200/200/400
# eps) and its cars workload is documented to drift late (PARITY.md
# cars-500 addendum, seed 7 only). This sweep doubles (+) the budgets
# at HEAD with 4 seeds to characterize post-budget stability:
#   unicycle 400 (2x) — the s12345 probe showed the low mode resolves
#   cars     500 (2.5x) — the known drift, now with seed bands
#   pvtol    800 (2x) — the hardest variant's long-horizon stability
#   nbc_unicycle 400 / nbc_pvtol 420 (2x) — the learned-barrier family
# Sequential: ONE process may own the axon tunnel at a time (CLAUDE.md).
set -u
cd /root/repo
OUT=results/r9/durability
mkdir -p "$OUT"
run() {
  local p=$1 eps=$2
  echo "=== $p x4 seeds, $eps episodes ==="
  # SIGKILL fallback (-k) so a timeout never leaves a live python
  # attached to the axon tunnel (a stale client hangs every later op —
  # CLAUDE.md), and one retry per preset (tunnel init windows swing
  # 15s-20min; an identical retry after a 20-min stall took 82s).
  timeout -k 30 14400 python train.py --preset "$p" \
    --max_episodes "$eps" --n_seeds 4 --quiet \
    --output "$OUT/$p" > "$OUT/$p.log" 2>&1
  local rc=$?
  if [ "$rc" -ne 0 ]; then
    # move the truncated first attempt ASIDE so the retry lands at the
    # canonical $OUT/$p path every downstream consumer (figures,
    # analysis, committed layout) reads — a partial tree left in place
    # would be silently analyzed as the real run
    echo "$p rc=$rc — retrying once"
    mv "$OUT/$p" "$OUT/${p}_failed_attempt" 2>/dev/null || true
    mv "$OUT/$p.log" "$OUT/${p}_failed_attempt.log" 2>/dev/null || true
    sleep 30
    timeout -k 30 14400 python train.py --preset "$p" \
      --max_episodes "$eps" --n_seeds 4 --quiet \
      --output "$OUT/$p" > "$OUT/$p.log" 2>&1
    rc=$?
  fi
  echo "$p rc=$rc"
}
run unicycle 400
run cars 500
run pvtol 800
run nbc_unicycle 400
run nbc_pvtol 420
echo DONE
