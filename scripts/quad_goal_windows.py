#!/usr/bin/env python
"""Summarize quadrotor sweep runs: goals per 30-episode window, death timing.

Usage: python scripts/quad_goal_windows.py results/r6/quad_currC_frozen [more dirs...]

Each dir is a sweep arm containing s<SEED>/ run trees as written by
train.py --output (see scripts/quad_lagwarmup_grid2.sh).  For every
seed it prints the goals-per-30-episode windows, the last goal episode
(with rho at that episode), ground-start goals (episodes >= the spawn
curriculum end, read from config.json), and last-30 mean cost — the
columns the PARITY.md quadrotor lever tables are built from.
"""
from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np


def load_progress(path: str):
    with open(path) as f:
        hdr = [h.strip() for h in f.readline().split("\t")]
        data = np.loadtxt(f, ndmin=2)
    return {k: data[:, j] for j, k in enumerate(hdr)}


def summarize_run(run_dir: str) -> str | None:
    hits = glob.glob(os.path.join(run_dir, "**", "progress.txt"), recursive=True)
    if not hits:
        return None
    try:
        col = load_progress(hits[0])
    except (ValueError, IndexError):
        return "in progress (no episodes logged yet)"
    if "Episode" not in col or len(col["Episode"]) == 0:
        return "in progress (no episodes logged yet)"
    cfg_path = os.path.join(os.path.dirname(hits[0]), "config.json")
    curr_end, mode = 0, "anneal"
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
        env = cfg.get("env") or {}
        curr_end = env.get("spawn_curriculum_episodes", 0) or 0
        mode = env.get("spawn_curriculum_mode", "anneal") or "anneal"
    ep, g = col["Episode"], col["goal_met"]
    rho = col.get("rho")
    n = len(ep)
    wins = " ".join(f"{int(g[a:a + 30].sum()):2d}" for a in range(0, n, 30))
    goal_eps = ep[g > 0]
    if len(goal_eps):
        last = int(goal_eps[-1])
        rho_last = rho[np.searchsorted(ep, last)] if rho is not None else float("nan")
        death = f"last goal ep {last:3d} (rho {rho_last:5.1f})"
    else:
        death = "no goals"
    if mode in ("mix", "mix_early") and curr_end:
        # Mix modes: only every MIX_GROUND_INTERVAL-th episode is a true
        # ground start (envs/quadrotor.py); score those alone so
        # retention is comparable across modes. Report the hit RATE too —
        # the eligible count is ~1/3 of the anneal modes'.  mix_early runs
        # the cadence from episode 0, but we still score ep>=curr_end so
        # the retention column is comparable with plain mix.
        sel = (ep >= curr_end) & (ep.astype(int) % 3 == 0)
        ground = int(g[sel].sum())
        gdesc = (f"ground-start (ep>={curr_end}, ep%3==0): {ground:3d}"
                 f"/{int(sel.sum()):3d}")
    else:
        ground = int(g[ep >= curr_end].sum()) if curr_end else int(g.sum())
        gdesc = f"ground-start (ep>={curr_end}): {ground:3d}"
    cost30 = col["cost_train"][-30:].mean()
    return (f"goals/30ep {wins} | total {int(g.sum()):3d} | {death} | "
            f"{gdesc} | last30 cost {cost30:6.1f}")


def main(dirs: list[str]) -> None:
    for arm in dirs:
        print(f"===== {arm}")
        seeds = sorted(glob.glob(os.path.join(arm, "s*")))
        for sd in seeds:
            if not os.path.isdir(sd):
                continue
            line = summarize_run(sd)
            if line:
                print(f"{os.path.basename(sd):>8}: {line}")


if __name__ == "__main__":
    main(sys.argv[1:] or sorted(glob.glob("results/r7/quad_*")))
