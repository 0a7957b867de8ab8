#!/usr/bin/env python
"""Grown-width bench (VERDICT r3 item 3): single-chip steps/s + state
memory at hidden = 256 (reference width) / 512 / 1024, interleaved per
episode so tunnel drift hits every variant equally.

Pairs with tests/test_parallel.py::test_tp_param_memory_shards (per-
device memory under tp=8) to state exactly when ``--tp`` is the right
tool: tp is a throughput LOSS at any width that fits one chip (the
all-reduces cost more than the halved matmuls save in this latency-
bound program) and becomes the right tool only when the grown state's
HBM footprint (params + targets + 2 Adam moments, reported here)
approaches chip capacity.

Run on the TPU from the repo root (no PYTHONPATH — see CLAUDE.md):
    python scripts/bench_grown_width.py [episodes] [w1,w2,...]
"""
import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax


def state_bytes(ts) -> int:
    return sum(x.nbytes for x in jax.tree.leaves(ts))


def main():
    import jax.numpy as jnp
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import get_config
    from nlbac_tpu.train.driver import create_replays, make_episode_runner

    episodes = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    steps = 400
    widths = (tuple(int(w) for w in sys.argv[2].split(","))
              if len(sys.argv) > 2 else (256, 512, 1024))
    base = get_config("unicycle")
    base = dataclasses.replace(
        base, env=dataclasses.replace(base.env, max_episode_steps=steps),
        sac=dataclasses.replace(base.sac, start_steps=200))

    runners, states, mem = {}, {}, {}
    for w in widths:
        cfg = dataclasses.replace(
            base, sac=dataclasses.replace(base.sac, hidden_dim=w))
        runners[w] = jax.jit(make_episode_runner(cfg))
        ts = create_train_state(cfg, jax.random.PRNGKey(0))
        mem[w] = state_bytes(ts)
        rl, node = create_replays(cfg)
        states[w] = (ts, rl, node, jax.random.PRNGKey(1), jnp.int32(0))

    results = {w: [] for w in widths}
    for ep in range(episodes):
        for w, run in runners.items():
            ts, rl, node, key, total = states[w]
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            ts, rl, node, m, total = run(ts, rl, node, k, jnp.int32(ep),
                                         total)
            m.reward.block_until_ready()
            dt = time.perf_counter() - t0
            states[w] = (ts, rl, node, key, total)
            if ep >= 2:  # skip compile + warmup episodes
                results[w].append(steps / dt)
            print(f"ep {ep} hidden={w:5d}: {steps / dt:8.1f} steps/s",
                  flush=True)

    print()
    ref = statistics.median(results[widths[0]])
    for w in widths:
        med = statistics.median(results[w])
        print(f"hidden={w:5d}: median {med:8.1f} steps/s "
              f"({med / ref:5.3f}x of {widths[0]}) | TrainState "
              f"{mem[w] / 1e6:7.2f} MB "
              f"(tp=8 shards the hidden-x-hidden leaves to "
              f"{mem[w] / 8 / 1e6:.2f}+ MB/device)")


if __name__ == "__main__":
    main()
