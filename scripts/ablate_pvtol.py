#!/usr/bin/env python
"""PVTOL device-time decomposition (round-3 scouting).

PVTOL is the expensive program (~590 steps/s vs unicycle ~1800). This
ablation decomposes its per-step device time by re-jitting the episode
program under dataclasses.replace'd configs:

  noupd      updates_per_step=0            -> env+select+replay path
  nofit      fit_episode_limit=0           -> no NODE fits (gather+fit
                                              branch never taken)
  nobackup   backup_update_interval=10**6  -> no backup-policy updates
  nofit_nobackup                           -> primary-update-only program
  full       reference pvtol               -> everything

Marginals: NODE fit = full-nofit; backup update = full-nobackup;
primary update chain = nofit_nobackup-noupd. (The 3-step HOCBF chain
itself is not config-separable — constraints/pvtol.py hard-composes 4
horizon states — so the chain cost is inside the primary marginal.)

Run from the repo root on the TPU: `python scripts/ablate_pvtol.py`.
Caveat (CLAUDE.md): op-level microbenches through the axon tunnel are
unstable — these are end-to-end episode timings, the trustworthy kind,
but still re-run twice before believing a delta under ~10%.
"""

from __future__ import annotations

import dataclasses
import json
import time


def bench(episodes: int = 4, steps: int = 400, updates_per_step=None,
          fit_episode_limit=None, backup_update_interval=None) -> float:
    import jax
    import jax.numpy as jnp
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import get_config
    from nlbac_tpu.train.driver import create_replays, make_episode_runner

    cfg = get_config("pvtol")
    sac_kw = dict(start_steps=200)
    if updates_per_step is not None:
        sac_kw["updates_per_step"] = updates_per_step
    node = (dataclasses.replace(cfg.node, fit_episode_limit=fit_episode_limit)
            if fit_episode_limit is not None else cfg.node)
    con = (dataclasses.replace(cfg.constraint,
                               backup_update_interval=backup_update_interval)
           if backup_update_interval is not None else cfg.constraint)
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=steps),
        sac=dataclasses.replace(cfg.sac, **sac_kw), node=node,
        constraint=con)
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, nrep = create_replays(cfg)
    run = jax.jit(make_episode_runner(cfg))

    total = jnp.int32(0)
    ts, rl, nrep, m, total = run(ts, rl, nrep, jax.random.PRNGKey(0),
                                 jnp.int32(0), total)
    m.reward.block_until_ready()
    t0 = time.perf_counter()
    n = 0
    for ep in range(1, episodes):
        ts, rl, nrep, m, total = run(ts, rl, nrep, jax.random.PRNGKey(ep),
                                     jnp.int32(ep), total)
        m.reward.block_until_ready()
        n += int(m.steps)
    return n / (time.perf_counter() - t0)


def main():
    from nlbac_tpu.train.cli import enable_compilation_cache
    enable_compilation_cache()
    rows = {}
    legs = {
        "full": {},
        "noupd": {"updates_per_step": 0},
        "nofit": {"fit_episode_limit": 0},
        "nobackup": {"backup_update_interval": 10 ** 6},
        "nofit_nobackup": {"fit_episode_limit": 0,
                           "backup_update_interval": 10 ** 6},
    }
    for label, kw in legs.items():
        sps = bench(**kw)
        rows[label] = round(1e6 / sps, 1)
        print(label, {"steps_per_sec": round(sps, 2),
                      "us_per_step": rows[label]}, flush=True)
    print(json.dumps({
        "env_select_replay_us": rows["noupd"],
        "update_marginal_us": round(rows["full"] - rows["noupd"], 1),
        "node_fit_marginal_us": round(rows["full"] - rows["nofit"], 1),
        "backup_update_marginal_us": round(
            rows["full"] - rows["nobackup"], 1),
        "primary_update_us": round(
            rows["nofit_nobackup"] - rows["noupd"], 1),
    }))


if __name__ == "__main__":
    main()
