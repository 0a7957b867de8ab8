"""Interleaved A/B: plain jax.jit episode runner vs the AOT
(jax.export deserialize) runner — same window, alternating episodes.

Motivation: a bench run through the AOT path measured 10-534 steps/s in
a window where r2 recorded ~1780 with plain jit; tunnel drift is the
suspected cause (CLAUDE.md) but the runner change must be exonerated in
the SAME window. Run from the repo root WITHOUT PYTHONPATH (axon).
"""

import dataclasses
import time

import jax
import jax.numpy as jnp

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.config import get_config
from nlbac_tpu.train.aot import cached_episode_runner
from nlbac_tpu.train.driver import create_replays, make_episode_runner


def main():
    from nlbac_tpu.train.cli import enable_compilation_cache
    enable_compilation_cache()
    cfg = get_config("unicycle")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=400),
        sac=dataclasses.replace(cfg.sac, start_steps=200))

    def fresh():
        return (create_train_state(cfg, jax.random.PRNGKey(0)),
                *create_replays(cfg))

    ts, rl, node = fresh()
    example = (ts, rl, node, jax.random.PRNGKey(0), jnp.int32(0),
               jnp.int32(0))
    runners = {"plain": jax.jit(make_episode_runner(cfg)),
               "aot": cached_episode_runner(cfg, example)}
    states = {k: [fresh(), jnp.int32(0)] for k in runners}

    # warmup/compile both
    for k, run in runners.items():
        (ts, rl, node), total = states[k]
        ts, rl, node, m, total = run(ts, rl, node, jax.random.PRNGKey(0),
                                     jnp.int32(0), total)
        m.reward.block_until_ready()
        states[k] = [(ts, rl, node), total]

    times = {k: [] for k in runners}
    for ep in range(1, 13):
        for k, run in runners.items():
            (ts, rl, node), total = states[k]
            t0 = time.perf_counter()
            ts, rl, node, m, total = run(ts, rl, node,
                                         jax.random.PRNGKey(ep),
                                         jnp.int32(ep), total)
            m.reward.block_until_ready()
            dt = time.perf_counter() - t0
            times[k].append(int(m.steps) / dt)
            states[k] = [(ts, rl, node), total]
    for k, v in times.items():
        v = sorted(v)
        print(f"{k}: median {v[len(v) // 2]:.0f} steps/s  "
              f"all {[round(x) for x in v]}")


if __name__ == "__main__":
    main()
