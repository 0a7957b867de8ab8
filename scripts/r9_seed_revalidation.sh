#!/bin/bash
# r9: multi-seed revalidation of the five reference presets at HEAD.
#
# Motivation: the bf3e624 first-update temperature-parity fix re-rolled
# every tuned trajectory; the post-fix revalidation (PARITY.md "Round-5
# revalidation", results/r4/revalidate) was seed 12345 only for
# unicycle/pvtol/nbc_* (cars had 3 seeds). In particular unicycle s12345
# landed in a "good-but-lower mode" (last-50 reward 525.9, goal 46/50) —
# this sweep measures whether that is a seed quirk or systematic.
#
# 4 seeds per preset via --n_seeds (seeds 12345..12348; s12345 doubles
# as a consistency check against the r5 single-seed runs). Reference
# hyperparameters come from the presets; budgets are the reference's.
# Sequential: ONE process may own the axon tunnel at a time (CLAUDE.md).
set -u
cd /root/repo
OUT=results/r9/seeds
mkdir -p "$OUT"
for p in cars unicycle nbc_unicycle nbc_pvtol pvtol; do
  echo "=== $p x4 seeds ==="
  timeout 7200 python train.py --preset "$p" --n_seeds 4 --quiet \
    --output "$OUT/$p" > "$OUT/$p.log" 2>&1
  echo "$p rc=$?"
done
echo DONE
