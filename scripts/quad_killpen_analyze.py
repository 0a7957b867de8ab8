#!/usr/bin/env python
"""Summarize the quadrotor kill-penalty sweep (results/r3/quad_killpen_*).

Prints per-seed: total goals, goals in the last 30 episodes, mean reward
over the last 30, mean episode length over the last 30 (34 == the suicide
signature), and the first goal episode.
"""
import glob
import sys

def summarize(root):
    rows = []
    for p in sorted(glob.glob(
            f"{root}/s*/quadrotor-run*/NBC_LBAC_Quadrotor/*/progress.txt")):
        seed = p.split("/")[3][1:]
        lines = [l.split("\t") for l in open(p).read().strip().split("\n")]
        idx = {k: i for i, k in enumerate(lines[0])}
        data = lines[1:]
        goals = [int(float(r[idx["goal_met"]])) for r in data]
        rew = [float(r[idx["reward_train"]]) for r in data]
        steps = [int(float(r[idx["episode_steps"]])) for r in data]
        alpha = [float(r[idx["alpha"]]) for r in data]
        fg = next((i for i, g in enumerate(goals) if g), None)
        rows.append((int(seed), len(goals), sum(goals), sum(goals[-30:]),
                     sum(rew[-30:]) / 30, sum(steps[-30:]) / 30, fg,
                     max(alpha), alpha[-1]))
    rows.sort()
    print(f"{'seed':>6} {'eps':>4} {'goals':>6} {'last30':>7} "
          f"{'rew_l30':>9} {'len_l30':>8} {'first_goal':>10} "
          f"{'a_max':>7} {'a_end':>7}")
    for r in rows:
        print(f"{r[0]:>6} {r[1]:>4} {r[2]:>6} {r[3]:>7} {r[4]:>9.1f} "
              f"{r[5]:>8.1f} {str(r[6]):>10} {r[7]:>7.2f} {r[8]:>7.2f}")

if __name__ == "__main__":
    for root in (sys.argv[1:] or ["results/r3/quad_killpen_p250"]):
        print(f"== {root}")
        summarize(root)
