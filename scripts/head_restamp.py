#!/usr/bin/env python
"""HEAD re-stamp: fresh runs of all six workloads, bit-compared
(shared columns, %.6g cell strings) against the standing archives.

The standing regression gate (PARITY.md round-11/13 certifications):
a zero-mismatch stamp proves the round's changes did not perturb the
device training program.  Two gate classes (VERDICT r4 item 5):

- DETERMINISM: seed-108 runs vs the r10/r4 archives (bit compare);
- HEALTH: a preset-default seed-12345 quadrotor run vs the r5 durable-
  recipe archive (bit compare) PLUS a band floor (goals and reward over
  the last 50 episodes) so an *intentional* future change that breaks
  bit-equality still cannot silently regress training quality on the
  sixth workload.

Run on the TPU from the repo root:

    python scripts/head_restamp.py [outdir]       # run + compare
    python scripts/head_restamp.py --compare-only [outdir]
    python scripts/head_restamp.py --only=<gate> [outdir]   # gate name
    # (gate names: unicycle/cars/pvtol/nbc_unicycle/nbc_pvtol/
    #  quadrotor/quadrotor_health — the quadrotor s108 determinism
    #  stamp and the s12345 health gate are separate gates)
"""
import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PRESETS = {  # name -> (preset, seed, episodes, archive, band)
    "unicycle": ("unicycle", 108, 200,
                 "results/r10/unicycle_seeds/s108/progress.txt", None),
    "cars": ("cars", 108, 200,
             "results/r10/cars_seeds/s108/progress.txt", None),
    "pvtol": ("pvtol", 108, 400,
              "results/r10/pvtol_seeds/s108/progress.txt", None),
    "nbc_unicycle": ("nbc_unicycle", 108, 200,
                     "results/r10/nbc_unicycle_seeds/s108/progress.txt",
                     None),
    "nbc_pvtol": ("nbc_pvtol", 108, 210,
                  "results/r10/nbc_pvtol_seeds/s108/progress.txt", None),
    # sixth workload (our design — the reference ships an empty
    # submodule): preset-default budget, archived at the r4 HEAD.
    # The s108 stamp gates DETERMINISM only (seed 108 is a
    # take-off-unlucky quadrotor seed; the preset's training story
    # lives in PARITY "Quadrotor").
    "quadrotor": ("quadrotor", 108, 210,
                  "results/r4/quadrotor_stamp/s108/progress.txt", None),
    # HEALTH gate: preset-default s12345 is the durable-recipe seed
    # (PARITY r5 lever 8: TE=-6 + rho_max=50 -> 50/50 goals from ep
    # 160). The band floor is deliberately loose (half the archived
    # goal rate, reward well under the archived 158.3) so it trips on
    # real regressions, not on minor intentional re-rolls.
    "quadrotor_health": (
        "quadrotor", 12345, 210,
        "results/r5/quad_rhocap50_te-6.0/s12345/quadrotor-run1/"
        "NBC_LBAC_Quadrotor/NBC_LBAC_Quadrotor_s12345/progress.txt",
        {"last": 50, "min_goals": 25, "min_reward": 50.0}),
}


def load_rows(path):
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        rows = [line.rstrip("\n").split("\t") for line in f]
    return header, rows


def compare(new_path, archive_path):
    """Return (mismatches, cells, first) over SHARED columns, exact
    string compare (both files carry %.6g-formatted cells)."""
    h1, r1 = load_rows(new_path)
    h2, r2 = load_rows(archive_path)
    shared = [c for c in h2 if c in h1]
    i1 = {c: h1.index(c) for c in shared}
    i2 = {c: h2.index(c) for c in shared}
    if len(r1) != len(r2):
        return -1, 0, f"row count {len(r1)} vs {len(r2)}"
    bad = 0
    cells = 0
    first = None
    for a, b in zip(r1, r2):
        for c in shared:
            cells += 1
            if a[i1[c]] != b[i2[c]]:
                bad += 1
                if first is None:
                    first = (c, a[i1[c]], b[i2[c]])
    return bad, cells, first


def check_band(path, band):
    """Health floor over the last `band['last']` episodes."""
    header, rows = load_rows(path)
    gi, ri = header.index("goal_met"), header.index("reward_train")
    tail = rows[-band["last"]:]
    goals = sum(float(r[gi]) for r in tail)
    reward = sum(float(r[ri]) for r in tail) / max(1, len(tail))
    ok = goals >= band["min_goals"] and reward >= band["min_reward"]
    return ok, (f"last-{band['last']}: goals {goals:.0f} "
                f"(floor {band['min_goals']}), mean reward {reward:.1f} "
                f"(floor {band['min_reward']})")


def find_progress(out):
    """Locate exactly one progress.txt under `out` (advisor r4: a
    re-used outdir grows runN+1 dirs and `find ... | head -1` could
    silently compare a STALE run — fail loudly instead)."""
    hits = glob.glob(os.path.join(out, "**", "progress.txt"),
                     recursive=True)
    if len(hits) > 1:
        raise SystemExit(
            f"{len(hits)} progress.txt files under {out} — stale runs "
            f"from a previous invocation? Use a fresh outdir:\n  "
            + "\n  ".join(hits))
    return hits[0] if hits else None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    outdir = args[0] if args else "results/r5_restamp"
    run = "--compare-only" not in sys.argv
    only = [a.split("=", 1)[1] for a in sys.argv[1:]
            if a.startswith("--only=")]
    failures = 0
    for name, (preset, seed, eps, archive, band) in PRESETS.items():
        # match by GATE name only: matching the preset too would make
        # --only=quadrotor silently run the full s12345 health training
        # run alongside the s108 determinism stamp (advisor r5)
        if only and name not in only:
            continue
        # resolve against REPO (advisor r4: `find` from the caller's
        # cwd while train.py runs with cwd=REPO searched the wrong tree)
        out = os.path.join(REPO, outdir, name)
        if run:
            if os.path.exists(out):
                print(f"{name}: outdir {out} already exists — refusing "
                      f"to run into it (stale-compare risk); pass a "
                      f"fresh outdir or --compare-only")
                failures += 1
                continue
            r = subprocess.run(
                [sys.executable, "train.py", "--preset", preset,
                 "--seed", str(seed), "--max_episodes", str(eps),
                 "--output", out, "--quiet"],
                cwd=REPO, capture_output=True, text=True, timeout=3600)
            if r.returncode != 0:
                print(f"{name}: RUN FAILED\n{r.stdout[-1500:]}"
                      f"{r.stderr[-1000:]}")
                failures += 1
                continue
        new_path = find_progress(out)
        if new_path is None:
            print(f"{name}: no progress.txt under {out}")
            failures += 1
            continue
        bad, cells, first = compare(new_path,
                                    os.path.join(REPO, archive))
        status = "OK" if bad == 0 else f"FAIL first={first}"
        if bad != 0:
            failures += 1
        msg = f"{name}: {bad}/{cells} cell mismatches {status}"
        if band is not None:
            ok, detail = check_band(new_path, band)
            msg += f" | band {'OK' if ok else 'FAIL'} ({detail})"
            if not ok:
                failures += 1
        print(msg, flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
