#!/usr/bin/env python
"""Aggregate the r9 multi-seed revalidation sweep (scripts/r9_seed_revalidation.sh).

Per preset x seed: last-50-episode reward mean, goals in the last 50,
episodes with nonzero safety violations in the last 100. Compares
against the r5 single-seed numbers recorded in PARITY.md "Round-5
revalidation"."""
import glob
import os
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "results", "r9", "seeds")


def load(path):
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        rows = [ln.rstrip("\n").split("\t") for ln in f if ln.strip()]
    cols = {h: np.array([float(r[i]) for r in rows]) for i, h in enumerate(header)}
    return cols


def main():
    for preset in ["unicycle", "cars", "nbc_unicycle", "nbc_pvtol", "pvtol"]:
        paths = sorted(glob.glob(os.path.join(ROOT, preset, "*", "s*", "progress.txt")))
        if not paths:
            continue
        print(f"=== {preset} ===")
        for p in paths:
            seed = p.split(os.sep)[-2]
            c = load(p)
            n = len(c["Episode"])
            r50 = c["reward_train"][-50:].mean()
            g50 = int(c["goal_met"][-50:].sum()) if "goal_met" in c else -1
            v100 = int((c["safety_cost_train"][-100:] > 0).sum())
            print(f"  {seed}: {n} eps | last-50 reward {r50:8.1f} | "
                  f"goals last-50 {g50:2d}/50 | viol-eps last-100 {v100:3d}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
