#!/usr/bin/env python
"""Interleaved A/B: decoupled policy/TD updates vs the reference order.

Variant "decoupled" uses nlbac_tpu.experimental.make_decoupled_episode_runner: the policy
and backup-policy losses read the PRE-update critic/Lyapunov/barrier/
NODE params, so the TD-update subgraphs and the policy subgraph share
no data dependency. The reference order (policy loss at the
just-stepped critic, UNI/sac_cbf_clf/sac_cbf_clf.py) makes the whole
update one sequential chain — the measured per-update bottleneck
(CLAUDE.md perf notes: ~480µs/step update marginal is the
critic-TD -> critic-Adam -> policy-loss -> policy-Adam dependency
chain). If XLA interleaves the now-independent subgraphs, the critical
path shortens with zero op-count change.

Outputs DIVERGE numerically (one-update-stale critic — a standard SAC
variation), so this A/B measures throughput only, on identically-seeded
but independently-evolving runs.

Run on the TPU from the repo root (no PYTHONPATH — see CLAUDE.md):
    python scripts/ab_decoupled.py [preset]
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
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import get_config
    from nlbac_tpu.train.driver import create_replays, make_episode_runner

    preset = sys.argv[1] if len(sys.argv) > 1 else "unicycle"
    steps = 400
    episodes = 12
    base = get_config(preset)
    base = dataclasses.replace(
        base, env=dataclasses.replace(base.env, max_episode_steps=steps),
        sac=dataclasses.replace(base.sac, start_steps=200))

    from nlbac_tpu.experimental import make_decoupled_episode_runner

    runners = {
        "decoupled": jax.jit(make_decoupled_episode_runner(base)),
        "coupled": jax.jit(make_episode_runner(base)),
    }
    states = {}
    for name in runners:
        ts = create_train_state(base, jax.random.PRNGKey(0))
        rl, node = create_replays(base)
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
            print(f"ep {ep} {name:9s}: {steps / dt:8.1f} steps/s")

    for name, r in results.items():
        print(f"{name}: median {statistics.median(r):.1f} steps/s "
              f"over {len(r)} episodes")
    med = {n: statistics.median(r) for n, r in results.items()}
    print(f"decoupled/coupled: {med['decoupled'] / med['coupled']:.3f}x")


if __name__ == "__main__":
    main()
