#!/usr/bin/env python
"""Interleaved A/B: fused per-step RL gather vs per-update gathers.

Variant "fused" = current code: the driver draws BOTH per-step updates'
RL batch indices up-front and gathers them in one (2B)-row gather, then
feeds each update its slice (agent.update_presampled).
Variant "split" = previous behavior: each update gathers its own B rows
(agent.update).  Identical key splits — same indices, same math — so the
final train states must agree bit-for-bit.

Run on the TPU from the repo root (no PYTHONPATH — see CLAUDE.md):
    python scripts/ab_fused_gather.py [preset]
"""
import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax


def main():
    import jax.numpy as jnp
    import numpy as np
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import get_config
    from nlbac_tpu.train.driver import create_replays, make_episode_runner

    preset = sys.argv[1] if len(sys.argv) > 1 else "unicycle"
    steps = 400
    episodes = 10
    cfg = get_config(preset)
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=steps),
        sac=dataclasses.replace(cfg.sac, start_steps=200,
                                updates_per_step=2))

    from nlbac_tpu.experimental import fused_gather_update_step

    runners = {
        "fused": jax.jit(make_episode_runner(
            cfg, _update_step=fused_gather_update_step(cfg))),
        "split": jax.jit(make_episode_runner(cfg)),
    }
    states = {}
    for name in runners:
        ts = create_train_state(cfg, jax.random.PRNGKey(0))
        rl, node = create_replays(cfg)
        states[name] = (ts, rl, node, jax.random.PRNGKey(1), jnp.int32(0))

    results = {n: [] for n in runners}
    for ep in range(episodes):
        for name, run in runners.items():
            ts, rl, node, key, total = states[name]
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            ts, rl, node, m, total = run(ts, rl, node, k, jnp.int32(ep),
                                         total)
            m.reward.block_until_ready()
            dt = time.perf_counter() - t0
            states[name] = (ts, rl, node, key, total)
            if ep >= 2:  # skip compile + warmup episodes
                results[name].append(steps / dt)
            print(f"ep {ep} {name:5s}: {steps / dt:8.1f} steps/s")

    for name, r in results.items():
        print(f"{name}: median {statistics.median(r):.1f} steps/s "
              f"over {len(r)} episodes")

    for a, b in zip(jax.tree_util.tree_leaves(states["fused"][0]),
                    jax.tree_util.tree_leaves(states["split"][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("final train states bit-equal (fused == split)")


if __name__ == "__main__":
    main()
