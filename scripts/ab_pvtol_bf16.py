#!/usr/bin/env python
"""Interleaved A/B: PVTOL NODE-fit compute dtype f32 vs bf16.

The pvtol ablation (scripts/ablate_pvtol.py) attributes ~224 µs/step of
the 1688 µs/step total to the amortized 32768-row NODE fit — the one
MXU-shaped chunk of the program. NodeConfig.compute_dtype='bfloat16'
runs the field's matmuls in bf16 with f32 params/outputs (measured
1.55x on the isolated fit, identical converged loss; config.py). This
measures whether it pays END-TO-END on the full pvtol episode program —
the only measurement CLAUDE.md says to trust on this tunneled device.

Run on the TPU from the repo root: python scripts/ab_pvtol_bf16.py
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

    steps = 400
    episodes = 10
    base = get_config("pvtol")
    base = dataclasses.replace(
        base, env=dataclasses.replace(base.env, max_episode_steps=steps),
        sac=dataclasses.replace(base.sac, start_steps=200))
    cfgs = {
        "f32": base,
        "bf16fit": dataclasses.replace(
            base, node=dataclasses.replace(base.node,
                                           compute_dtype="bfloat16")),
    }
    runners = {n: jax.jit(make_episode_runner(c)) for n, c in cfgs.items()}
    states = {}
    for name, c in cfgs.items():
        ts = create_train_state(c, jax.random.PRNGKey(0))
        rl, node = create_replays(c)
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
            if ep >= 2:
                results[name].append(steps / dt)
            print(f"ep {ep} {name:8s}: {steps / dt:8.1f} steps/s",
                  flush=True)

    meds = {n: statistics.median(r) for n, r in results.items()}
    for name, med in meds.items():
        print(f"{name}: median {med:.1f} steps/s over "
              f"{len(results[name])} episodes")
    print(f"bf16fit/f32 = {meds['bf16fit'] / meds['f32']:.3f}")


if __name__ == "__main__":
    main()
