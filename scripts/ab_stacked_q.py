#!/usr/bin/env python
"""Interleaved A/B: STORED-stacked twin-Q vs the plain {'q1','q2'} layout.

Variant "stacked" uses nlbac_tpu.experimental.stack_twin_q_state: the two Q-nets'
layer weights live as one leaf per layer with a leading k=2 axis, so
every twin-Q forward is one batched einsum per layer (half the matmul op
count) and the critic's Adam/soft-update touch half as many leaves.
Unlike the r2 runtime-stacking experiment (measured -4%; the per-call
jnp.stack + slice VJPs outweighed the halved matmuls, CLAUDE.md), the
compiled program here contains no stack/slice ops — the layout is fixed
at init.

Init values are identical across layouts (same per-network keys), but
einsum reassociation means outputs match only to f32 tolerance, not
bit-for-bit; the equivalence test lives in
tests/test_nn.py::test_stacked_twin_q_episode_equivalence.

Run on the TPU from the repo root (no PYTHONPATH — see CLAUDE.md):
    python scripts/ab_stacked_q.py [preset]
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

    from nlbac_tpu.experimental import stack_twin_q_state

    runners, states = {}, {}
    for name in ("stacked", "plain"):
        runners[name] = jax.jit(make_episode_runner(base))
        ts = create_train_state(base, jax.random.PRNGKey(0))
        if name == "stacked":
            ts = stack_twin_q_state(base, ts)
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
            print(f"ep {ep} {name:7s}: {steps / dt:8.1f} steps/s")

    for name, r in results.items():
        print(f"{name}: median {statistics.median(r):.1f} steps/s "
              f"over {len(r)} episodes")
    med = {n: statistics.median(r) for n, r in results.items()}
    print(f"stacked/plain: {med['stacked'] / med['plain']:.3f}x")


if __name__ == "__main__":
    main()
