#!/usr/bin/env python
"""Lever-12 retention figure (PARITY.md r7, quadrotor).

Goal-rate curves for the four arms that isolate what a spawn
curriculum must do to RETAIN flight:

  D  anneal 120, then ground only   — collapses ~25 eps after the
                                      anneal ends (lever-10 recipe)
  J  anneal 210, run 300            — control: the same collapse,
                                      shifted to ITS anneal end
  I  anneal 120 + stationary mix    — no collapse; scores to ep 298
  K  anneal 210 + stationary mix    — best totals yet (152/146)

Two stacked panels (seed 1 / seed 12345) on a shared episode axis —
small multiples, one metric, one axis. Colors are categorical slots
1-4 of the dataviz reference palette in fixed order (adjacent-pair
validated per its docs; the yellow slot's light-surface contrast WARN
is relieved by direct labels on every series).

Usage: python scripts/quad_lever12_figure.py [out.png]
"""
import glob
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

# (label, run root, slot color, linestyle, end-label y-offset pts).
# The anneal arms are dashed: each is bit-identical to its mix twin
# until its anneal ends (same seeds, same anneal-phase RNG), so the
# solid twin would otherwise hide it entirely.
ARMS = [
    ("D: anneal 120", "results/r6/quad_currD_rho20/s{seed}", "#2a78d6",
     "--", 10),
    ("J: anneal 210", "results/r7/quad_armJ_curr210x300/s{seed}", "#eb6834",
     "--", 10),
    ("I: mix after 120", "results/r7/quad_armI_mix120/s{seed}", "#1baf7a",
     "-", 0),
    ("K: mix after 210", "results/r7/quad_armK_mix210/s{seed}", "#eda100",
     "-", -10),
]
WIN = 10


def load_goals(run_root):
    p = glob.glob(f"{run_root}/*/*/*/progress.txt")[0]
    with open(p) as f:
        hdr = f.readline().strip().split("\t")
        rows = [ln.strip().split("\t") for ln in f if ln.strip()]
    j = hdr.index("goal_met")
    return [float(r[j]) for r in rows]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "results/r7/quad_lever12_retention.png"
    fig, axes = plt.subplots(2, 1, figsize=(8.6, 5.6), sharex=True,
                             gridspec_kw={"hspace": 0.16})
    for ax, seed in zip(axes, ("1", "12345")):
        for name, root, color, ls, dy in ARMS:
            try:
                gm = load_goals(root.format(seed=seed))
            except IndexError:
                continue
            xs = list(range(WIN // 2, len(gm) + WIN // 2, WIN))
            ys = [sum(gm[s:s + WIN]) for s in range(0, len(gm), WIN)]
            ax.plot(xs, ys, color=color, lw=2, ls=ls)
            # direct label at the last nonzero window: distinct per arm
            # (each dies/ends elsewhere), never on the shared zero line
            last = max((j for j, y in enumerate(ys) if y > 0), default=0)
            ax.annotate(name.split(":")[0], (xs[last], ys[last]),
                        xytext=(4, dy), textcoords="offset points",
                        color=color, fontsize=9, va="center")
        for x, lbl in ((120, "anneal ends (D, I)"),
                       (210, "anneal ends (J, K)")):
            ax.axvline(x, color="#52514e", lw=1, ls=":")
            if seed == "1":
                ax.text(x + 2, 9.6, lbl, fontsize=8, color="#52514e")
        ax.set_ylabel(f"goals / {WIN} eps (seed {seed})")
        ax.set_ylim(0, 10.5)
        ax.set_xlim(0, 315)
        ax.spines[["top", "right"]].set_visible(False)
        ax.grid(axis="y", color="#e5e4e0", lw=0.6)
        ax.set_axisbelow(True)
    axes[0].set_title(
        "Quadrotor goal retention: a stationary spawn mix (I, K) removes the "
        "post-anneal collapse (D, J)", fontsize=11)
    axes[0].legend(
        [plt.Line2D([], [], color=c, lw=2, ls=ls)
         for _, _, c, ls, _ in ARMS],
        [n for n, _, _, _, _ in ARMS], loc="upper left", frameon=False,
        fontsize=9, ncol=2)
    axes[1].set_xlabel("episode")
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
