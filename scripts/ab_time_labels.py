#!/usr/bin/env python
"""Effect-size A/B: Cars NODE-buffer time labels (PARITY.md "Known
deliberate divergences", row 1).

Variant "reference" sets NodeConfig.reference_time_labels=True — the
reference's off-by-one-dt NODE-buffer times (CARS/main.py:95-97);
variant "consistent" is this framework's default (t=(step-1)*dt shared
with the RL buffer). The label is an input feature of the Cars
time-input NODE only, so the first gated NODE fit chaotically forks the
trajectories; the question is whether either convention trains
differently in distribution.

Interleaved over episodes (same-window noise), one seed, full cars
episode length. Reports per-variant reward / NODE-loss trajectories and
last-20-episode means.

Run on the TPU from the repo root (no PYTHONPATH — see CLAUDE.md):
    python scripts/ab_time_labels.py [episodes]
"""
import dataclasses
import os
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

    episodes = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    base = get_config("cars")

    cfgs = {
        "reference": dataclasses.replace(
            base, node=dataclasses.replace(base.node,
                                           reference_time_labels=True)),
        "consistent": base,
    }
    runners, states = {}, {}
    for name, cfg in cfgs.items():
        runners[name] = jax.jit(make_episode_runner(cfg))
        ts = create_train_state(cfg, jax.random.PRNGKey(0))
        rl, node = create_replays(cfg)
        states[name] = (ts, rl, node, jax.random.PRNGKey(1), jnp.int32(0))

    hist = {n: {"reward": [], "node_loss": []} for n in runners}
    t0 = time.perf_counter()
    for ep in range(episodes):
        for name, run in runners.items():
            ts, rl, node, key, total = states[name]
            key, k = jax.random.split(key)
            ts, rl, node, m, total = run(ts, rl, node, k, jnp.int32(ep),
                                         total)
            states[name] = (ts, rl, node, key, total)
            hist[name]["reward"].append(float(m.reward))
            hist[name]["node_loss"].append(float(m.train["node_loss"]))
        if ep % 10 == 0:
            r = {n: round(hist[n]["reward"][-1], 1) for n in runners}
            print(f"ep {ep}: {r}", flush=True)
    print(f"wall: {time.perf_counter() - t0:.1f}s")
    for name in runners:
        rw = hist[name]["reward"]
        nl = [x for x in hist[name]["node_loss"] if x > 0]
        tail = rw[-20:]
        print(f"{name}: last-20 reward mean {sum(tail)/len(tail):.2f} "
              f"(min {min(tail):.1f}, max {max(tail):.1f}); "
              f"final nonzero node_loss {nl[-1]:.3e}" if nl else
              f"{name}: last-20 reward mean {sum(tail)/len(tail):.2f}")


if __name__ == "__main__":
    main()
