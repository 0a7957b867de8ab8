#!/usr/bin/env python
"""Summarize the quadrotor rho-cap sweep (lever 8, PARITY.md r5).

For every run under results/r5/quad_rhocap*: goals per 30-episode
chunk, last-30 retention, and the rho/lam_max/alpha endpoints — the
hypothesis is that capping rho below the goal-window band (2.5-51 in
the instrumented TE=-6 run) preserves retention where rho_max=200
kills it.

Usage: python scripts/quad_rhocap_analyze.py [glob_root]
"""
import glob
import sys


def summarize(progress_path: str) -> str:
    with open(progress_path) as f:
        hdr = f.readline().strip().split("\t")
        rows = [ln.split("\t") for ln in f if ln.strip()]
    idx = {c: j for j, c in enumerate(hdr)}

    def col(name):
        return [float(r[idx[name]]) for r in rows] if name in idx else None

    gm, rw = col("goal_met"), col("reward_train")
    chunks = [int(sum(gm[s:s + 30])) for s in range(0, len(gm), 30)]
    extra = ""
    for name in ("rho", "lam_max", "alpha"):
        v = col(name)
        if v:
            extra += f" {name}_end={v[-1]:.1f}"
    return (f"goals/30ep={chunks} last30={int(sum(gm[-30:]))}"
            f" last30_rew={sum(rw[-30:]) / 30:.0f}{extra}")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "results/r5/quad_rhocap*"
    paths = sorted(glob.glob(f"{root}/s*/*/*/*/progress.txt"))
    if not paths:
        print(f"no runs under {root}")
        return
    for p in paths:
        arm = p.split("/")[2]
        seed = p.split("/")[3]
        print(f"{arm} {seed}: {summarize(p)}")


if __name__ == "__main__":
    main()
