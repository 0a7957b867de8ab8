#!/usr/bin/env python
"""Compare the EXECUTED reference run (VERDICT r4 item 1) against our
cars runs, band-to-band, and render the learning curves side by side.

The reference (LiqunZhao/NLBAC, Cars variant) was run for real on CPU —
patched only where its environment demands: torch.device("cuda")->"cpu"
(CARS/sac_cbf_clf/model.py:11), a no-op wandb stub (main.py:11), a
minimal gym shim over the installed gymnasium (envs/simulated_cars_env
.py:6-7), a single-process mpi4py stub (utils/mpi_tools.py), and a
fixed-step euler odeint for torchdiffeq (model.py:5; the reference only
ever calls method='euler' over a 2-point grid, so one explicit Euler
step per interval IS torchdiffeq's behavior; atol/rtol are inert —
SURVEY §2.2).  Run: `python main.py --max_episodes 200` (the 200x300
budget), seed 12345 (the reference default).

Usage:
    python scripts/compare_reference_run.py <ref_progress.txt> [outdir]
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OURS = {
    "ours (fused, TPU)": ("results/r4/revalidate/cars/cars-run1/"
                          "Node_LBAC_Cars/Node_LBAC_Cars_s12345/"
                          "progress.txt"),
    "ours (host-loop, TPU)": ("results/r4/host_loop_cars/cars-run1/"
                              "Node_LBAC_Cars/Node_LBAC_Cars_s12345/"
                              "progress.txt"),
}


def load(path):
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        rows = [line.rstrip("\n").split("\t") for line in f
                if line.strip()]
    cols = {c: np.array([float(r[i]) for r in rows])
            for i, c in enumerate(header)}
    return cols


def stats(cols, n=50):
    r = cols["reward_train"][-n:]
    v = cols["cost_train"][-n:]
    reach = cols.get("reached_train", cols.get("reached"))
    out = {
        "episodes": len(cols["reward_train"]),
        f"last{n}_reward_mean": float(np.mean(r)),
        f"last{n}_reward_std": float(np.std(r)),
        f"last{n}_violations_per_ep": float(np.mean(v)),
        f"last{n}_zero_viol_episodes": int(np.sum(v == 0)),
    }
    if reach is not None:
        out[f"last{n}_reached_mean"] = float(np.mean(reach[-n:]))
    return out


def main():
    ref_path = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "results/r5/executed_reference")
    os.makedirs(outdir, exist_ok=True)

    curves = {"reference (torch, CPU, EXECUTED)": load(ref_path)}
    # a sibling *_s1.txt (the second executed seed) joins the plot
    s1 = ref_path.replace(".txt", "_s1.txt")
    if os.path.exists(s1) and s1 != ref_path:
        curves["reference s1 (torch, CPU, EXECUTED)"] = load(s1)
    for name, rel in OURS.items():
        p = os.path.join(REPO, rel)
        if os.path.exists(p):
            curves[name] = load(p)
        else:
            print(f"missing {p}", file=sys.stderr)

    print(f"{'run':34s} {'eps':>4s} {'last50 rew':>12s} {'viol/ep':>8s} "
          f"{'0-viol eps':>10s} {'reached':>8s}")
    for name, cols in curves.items():
        s = stats(cols)
        print(f"{name:34s} {s['episodes']:4d} "
              f"{s['last50_reward_mean']:8.1f}+-"
              f"{s['last50_reward_std']:<5.1f} "
              f"{s['last50_violations_per_ep']:8.2f} "
              f"{s['last50_zero_viol_episodes']:10d} "
              f"{s.get('last50_reached_mean', float('nan')):8.1f}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        for name, cols in curves.items():
            r = cols["reward_train"]
            k = np.ones(10) / 10
            sm = np.convolve(r, k, mode="valid")
            axes[0].plot(np.arange(len(sm)) + 9, sm, label=name)
            axes[1].plot(np.cumsum(cols["cost_train"]), label=name)
        axes[0].set_xlabel("episode")
        axes[0].set_ylabel("reward (10-ep moving avg)")
        axes[0].legend(fontsize=7)
        axes[1].set_xlabel("episode")
        axes[1].set_ylabel("cumulative safety violations")
        fig.suptitle("Cars 200x300, seed 12345: executed torch reference "
                     "vs nlbac-tpu")
        fig.tight_layout()
        out = os.path.join(outdir, "cars_reference_vs_ours.png")
        fig.savefig(out, dpi=120)
        print(f"plot -> {out}")
    except Exception as e:  # noqa: BLE001
        print(f"plot skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
