#!/usr/bin/env python
"""In-flight competence matrix for the r9 save_best harvest (PARITY.md
"Footnote (b) measured directly"): every seed's {final, best} weights
evaluated with one deterministic rollout from each of three points on
the mix-curriculum spawn arc (evaluator --spawn_alpha machinery,
nlbac_tpu/envs/quadrotor.py spawn_at_alpha).

Documented result: at alpha=0.3 three of four seeds fly clean (+235
return, 0 violations, best and final alike; s12348 fails every spawn);
at alpha=0.6 only s12345's BEST snapshot succeeds where its own final
crashes; at alpha=0.85 every weight set fails.

Runs on the host CPU (never touches the TPU tunnel).
Usage: python scripts/quad_alpha_matrix.py [run_root]
  run_root: directory containing s<seed>/ run dirs
            (default: the r9 harvest archived in results/)
"""
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # noqa: E402 — before backend init

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.config import get_config
from nlbac_tpu.train.checkpoint import load_model_weights
from nlbac_tpu.utils.evaluate import run_policy

DEFAULT_ROOT = "results/r9/quad_savebest_4seed/quadrotor-run1"
SEEDS = (12345, 12346, 12347, 12348)
ALPHAS = (0.3, 0.6, 0.85)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_ROOT
    cfg = get_config("quadrotor")
    for seed in SEEDS:
        for label, sub in (("final", ""), ("best", "best")):
            d = os.path.join(root, f"s{seed}", sub).rstrip(os.sep)
            # check for the weights themselves, not the directory: the
            # run dirs' progress.txt/config.json are committed but the
            # .pkl weights are gitignored (~12 MB for 8 sets), so a
            # fresh clone has the directories without the weights —
            # re-create them with the sweep command in PARITY.md
            # "Footnote (b) measured directly"
            if not os.path.exists(os.path.join(d, "actor.pkl")):
                print(f"s{seed} {label}: weights not on disk ({d}) — "
                      "re-run the harvest sweep to regenerate")
                continue
            ts = create_train_state(cfg, jax.random.PRNGKey(0))
            ts = load_model_weights(d, ts, include_barrier=True)
            cells = []
            for a in ALPHAS:
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    res = run_policy(cfg, ts, episodes=1, seed=0,
                                     spawn_alpha=a)
                r = res[0]
                cells.append(f"a={a}: ret {r['return']:7.1f} "
                             f"len {r['length']:4.0f} "
                             f"viol {r['violations']:3.0f}")
            print(f"s{seed} {label:5s} | " + " | ".join(cells),
                  flush=True)


if __name__ == "__main__":
    main()
