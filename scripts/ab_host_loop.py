#!/usr/bin/env python
"""Phase-interleaved A/B: old (r4, per-leaf H2D + split dispatches +
separate sup_post) vs new (r5, one fused step program + one packed
device_put + fold_in keys) host-loop on the cars workload, real TPU.

Phases (not per-episode interleaving): CLAUDE.md — blocking vs
non-blocking variants mis-attribute device time when alternated
per-episode on one chip.

Run from the repo root (no PYTHONPATH): python scripts/ab_host_loop.py
"""
import dataclasses
import statistics
import subprocess
import sys
import types

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def load_old_host_loop():
    """Materialize the pre-r5 implementation from git as a module."""
    src = subprocess.run(
        ["git", "show", "0c22f3d:nlbac_tpu/train/host_loop.py"],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    mod = types.ModuleType("host_loop_r4")
    exec(compile(src, "host_loop_r4.py", "exec"), mod.__dict__)
    return mod


def make_setup():
    from nlbac_tpu.config import get_config
    from nlbac_tpu.envs import as_host_env, get_env
    from nlbac_tpu.train.driver import build_step_kwargs

    cfg = get_config("cars")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=300),
        sac=dataclasses.replace(cfg.sac, start_steps=200))
    mod = get_env("cars")
    adapter = as_host_env(mod, seed=0, max_episode_steps=300,
                          step_kwargs=build_step_kwargs(cfg, mod))
    return cfg, adapter


def run_phase(train_fn, cfg, adapter, episodes, seed):
    _, hist = train_fn(cfg, adapter, episodes=episodes, seed=seed)
    return [r["episode_steps"] / r["wall_s"] for r in hist]


def main():
    from nlbac_tpu.train.host_loop import train_host_env as new_fn
    old_mod = load_old_host_loop()
    old_fn = old_mod.train_host_env

    eps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    phases = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rates = {"old": [], "new": []}
    for p in range(phases):
        for name, fn in (("old", old_fn), ("new", new_fn)):
            cfg, adapter = make_setup()
            r = run_phase(fn, cfg, adapter, eps, seed=p)
            # drop the first episode of EVERY phase: each phase builds
            # fresh per-call jax.jit closures, so every phase's first
            # episode carries recompile (the persistent XLA cache does
            # not cover the jaxpr->MLIR lowering on this backend, and
            # the two arms compile different program counts — keeping
            # those episodes would bias the arms unequally; advisor r5)
            rates[name] += r[1:]
            print(f"phase {p} {name}: "
                  + " ".join(f"{x:.2f}" for x in r), flush=True)
    for name in ("old", "new"):
        print(f"{name}: median {statistics.median(rates[name]):.2f} "
              f"steps/s over {len(rates[name])} episodes")
    print(f"speedup: {statistics.median(rates['new']) / statistics.median(rates['old']):.3f}x")


if __name__ == "__main__":
    main()
