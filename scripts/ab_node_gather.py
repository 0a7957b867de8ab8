#!/usr/bin/env python
"""Interleaved A/B: gated (lazy) vs unconditional (eager) NODE-batch gather.

Variant A = current code: the 32768-row NODE sample traces inside the
lax.cond fit branch, so the gather is skipped on the ~(1-1/interval) of
updates where the NODE fit is gated off.
Variant B = round-1 behavior: sample eagerly every update, then call
update_from_batch (identical key splits — same RNG stream, same math).

Run on the TPU from the repo root (no PYTHONPATH — see CLAUDE.md):
    python scripts/ab_node_gather.py
"""
import dataclasses
import os
import sys
import time

# repo root on the path WITHOUT PYTHONPATH (which breaks axon plugin
# registration — CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax


def make_runner(eager: bool, cfg):
    import jax.numpy as jnp
    from nlbac_tpu import replay as replay_lib
    from nlbac_tpu.agent import make_agent
    import nlbac_tpu.train.driver as driver

    if not eager:
        return jax.jit(driver.make_episode_runner(cfg))

    real_make_agent = driver.make_agent

    def patched_make_agent(cfg, env_override=None):
        agent = real_make_agent(cfg, env_override=env_override)

        def eager_update(ts, rl_replay, node_replay, key, i_episode):
            keys = jax.random.split(key, 3)
            batch = replay_lib.sample(rl_replay, keys[0],
                                      cfg.sac.batch_size)
            node_batch = replay_lib.sample(node_replay, keys[1],
                                           cfg.node.max_batch)
            return agent.update_from_batch(ts, batch, node_batch, keys[2],
                                           i_episode)

        return agent._replace(update=eager_update)

    driver.make_agent = patched_make_agent
    try:
        return jax.jit(driver.make_episode_runner(cfg))
    finally:
        driver.make_agent = real_make_agent


def main():
    import jax.numpy as jnp
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import get_config
    from nlbac_tpu.train.driver import create_replays

    steps = 400
    episodes = 8
    cfg = get_config("unicycle")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=steps),
        sac=dataclasses.replace(cfg.sac, start_steps=200))

    runners = {"lazy": make_runner(False, cfg),
               "eager": make_runner(True, cfg)}
    states = {}
    for name in runners:
        ts = create_train_state(cfg, jax.random.PRNGKey(0))
        rl, node = create_replays(cfg)
        states[name] = (ts, rl, node, jax.random.PRNGKey(1),
                        jnp.int32(0))

    results = {n: [] for n in runners}
    for ep in range(episodes):
        for name, run in runners.items():
            ts, rl, node, key, total = states[name]
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            ts, rl, node, m, total = run(ts, rl, node, k,
                                         jnp.int32(ep), total)
            m.reward.block_until_ready()
            dt = time.perf_counter() - t0
            states[name] = (ts, rl, node, key, total)
            if ep >= 2:  # skip compile + warmup episodes
                results[name].append(steps / dt)
            print(f"ep {ep} {name:5s}: {steps / dt:8.1f} steps/s")

    for name, r in results.items():
        import statistics
        print(f"{name}: median {statistics.median(r):.1f} steps/s "
              f"over {len(r)} episodes")

    # same key splits -> same batches -> identical math: the two
    # variants must agree bit-for-bit after the full run
    import numpy as np
    for a, b in zip(jax.tree_util.tree_leaves(states["lazy"][0]),
                    jax.tree_util.tree_leaves(states["eager"][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("final train states bit-equal (lazy == eager)")


if __name__ == "__main__":
    main()
