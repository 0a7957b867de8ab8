"""A/B: fused device episode program vs --host_loop architecture.

Measures env-steps/sec of the SAME unicycle config under the two
training architectures (phase-alternated F,H,F,H on fresh instances;
first phase of each mode discarded as compile warm-up):

- fused: train/driver.make_episode_runner — one jitted XLA program per
  episode, replay + supervisor + updates inside one lax.while_loop.
- host-loop: train/host_loop.train_host_env via envs.as_host_env — the
  reference's own program shape: a Python step loop, one jitted action
  dispatch + one jitted env-step + per-update jitted update_from_batch,
  native C++ replay rings on the host.

This is an ARCHITECTURE-cost number, not a kernel number: the host-loop
mode pays per-step dispatch latency (and, on a tunneled TPU backend,
per-step round trips — expect a far larger gap there than the CPU
number this script prints). Run on CPU from the repo root:

    python scripts/ab_host_loop.py

Measured r14 (quiet CPU host, 8-device virtual mesh conftest NOT in
play, unicycle, 200-step episodes, batch 64, 2 updates/step):
fused ~4.6x the host-loop steps/s (see DESIGN.md §1).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from nlbac_tpu.config import ReplayConfig, get_config  # noqa: E402


def make_cfg():
    cfg = get_config("unicycle")
    return dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, max_episode_steps=200),
        sac=dataclasses.replace(cfg.sac, start_steps=50, batch_size=64),
        replay=ReplayConfig(capacity=8192, node_capacity=8192),
        run=dataclasses.replace(cfg.run, max_episodes=4),
    )


def run_fused(cfg, seed):
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.train.driver import create_replays, make_episode_runner

    key = jax.random.PRNGKey(seed)
    key, kinit = jax.random.split(key)
    ts = create_train_state(cfg, kinit)
    rl, node = create_replays(cfg)
    run_episode = jax.jit(make_episode_runner(cfg))
    total = jnp.int32(0)
    steps = 0
    t0 = None
    for ep in range(cfg.run.max_episodes):
        key, kep = jax.random.split(key)
        ts, rl, node, m, total = run_episode(ts, rl, node, kep,
                                             jnp.int32(ep), total)
        m.reward.block_until_ready()
        if ep == 0:  # compile episode
            t0 = time.perf_counter()
        else:
            steps += int(m.steps)
    return steps / (time.perf_counter() - t0)


def run_host(cfg, seed):
    from nlbac_tpu.envs import as_host_env, unicycle
    from nlbac_tpu.train.host_loop import train_host_env

    adapter = as_host_env(unicycle, seed=seed,
                          max_episode_steps=cfg.env.max_episode_steps)
    # episode 0 warms the jitted select/update/sup_post calls
    t = [None]

    class Probe:
        """logger shim: timestamps episode boundaries."""
        def __init__(self):
            self.rows = []

        def store(self, **kw):
            self.rows.append(kw)
            if len(self.rows) == 1:
                t[0] = time.perf_counter()

        def log_tabular(self, *a, **k):
            pass

        def dump_tabular(self):
            pass

    probe = Probe()
    train_host_env(cfg, adapter, seed=seed, logger=probe)
    steps = sum(r["episode_steps"] for r in probe.rows[1:])
    return steps / (time.perf_counter() - t[0])


def main():
    fused, host = [], []
    for phase in range(2):  # F,H,F,H
        fused.append(run_fused(make_cfg(), seed=100 + phase))
        host.append(run_host(make_cfg(), seed=100 + phase))
        print(f"phase {phase}: fused {fused[-1]:.1f} steps/s, "
              f"host-loop {host[-1]:.1f} steps/s")
    f, h = max(fused), max(host)
    print(f"best-of: fused {f:.1f} vs host-loop {h:.1f} steps/s "
          f"-> fused is {f / h:.2f}x (CPU; expect a far larger gap "
          f"through a tunneled TPU)")


if __name__ == "__main__":
    main()
