#!/usr/bin/env python
"""Lever-10 mechanism figure (PARITY.md r6/r7, quadrotor take-off).

Seed-1 comparison of the three schedule arms that isolate the
augmented-Lagrangian ratchet's role (all with spawn curriculum 120):

  B  warmup 60, rho_max 50   — goals survive lambda saturation, die in
                               the rho 29->50 window
  C  frozen whole run        — goals die at ~ep 45 with ZERO pressure
                               (crash optimum returns); pressure onset
                               at ep 60 is what RESCUES arm B
  D  warmup 60, rho_max 20   — the predicted sweet spot

Two stacked panels on a shared episode axis (goals/10ep; rho, log
scale) — small multiples, not a dual axis. Colors are the validated
categorical slots 1-3 of the dataviz reference palette, fixed order.

Usage: python scripts/quad_lever10_figure.py [out.png]
"""
import glob
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

ARMS = [
    ("B: warmup60, rho<=50", "results/r6/quad_lagwarm60_curr120/s1", "#2a78d6"),
    ("C: frozen all 210 eps", "results/r6/quad_currC_frozen/s1", "#eb6834"),
    ("D: warmup60, rho<=20", "results/r6/quad_currD_rho20/s1", "#1baf7a"),
]


def load(run_root):
    p = glob.glob(f"{run_root}/*/*/*/progress.txt")[0]
    with open(p) as f:
        hdr = f.readline().strip().split("\t")
        rows = [ln.strip().split("\t") for ln in f if ln.strip()]
    idx = {c: j for j, c in enumerate(hdr)}
    col = lambda n: [float(r[idx[n]]) for r in rows]
    return col("goal_met"), col("rho")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "results/r6/quad_lever10_mechanism.png"
    fig, (ax_g, ax_r) = plt.subplots(
        2, 1, figsize=(8, 5.4), sharex=True,
        gridspec_kw={"height_ratios": [2, 1], "hspace": 0.12})
    for name, root, color in ARMS:
        try:
            gm, rho = load(root)
        except IndexError:
            continue  # arm not run yet
        eps = list(range(5, len(gm) + 5, 10))
        g10 = [sum(gm[s:s + 10]) for s in range(0, len(gm), 10)]
        ax_g.plot(eps, g10, color=color, lw=2, label=name)
        ax_r.plot(range(len(rho)), rho, color=color, lw=2)
    ax_g.axvline(60, color="#52514e", lw=1, ls=":")
    ax_g.text(62, 9.3, "warmup ends (B, D)", fontsize=8, color="#52514e")
    ax_g.axvline(120, color="#52514e", lw=1, ls=":")
    ax_g.text(122, 9.3, "curriculum ends", fontsize=8, color="#52514e")
    ax_g.set_ylabel("goals per 10 episodes")
    ax_g.set_ylim(0, 10.5)
    ax_g.legend(loc="center right", frameon=False, fontsize=9)
    ax_g.set_title("Quadrotor take-off vs the AL schedule (seed 1, curriculum 120)",
                   fontsize=11)
    ax_r.axhspan(29, 50, color="#eb6834", alpha=0.12, lw=0)
    ax_r.text(2, 36, "arm-B goal-death window", fontsize=8, color="#52514e")
    ax_r.set_yscale("log")
    ax_r.set_ylabel("rho")
    ax_r.set_xlabel("episode")
    for ax in (ax_g, ax_r):
        ax.spines[["top", "right"]].set_visible(False)
        ax.grid(axis="y", color="#e5e4e0", lw=0.6)
        ax.set_axisbelow(True)
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
