#!/usr/bin/env python
"""Minimal library-surface training loop — no CLI, no logger.

Shows the three-call core of the framework: build a config, create the
train state + replay buffers, and run whole episodes as single compiled
XLA programs. Everything else in `train.py` (progress.txt, checkpoints,
wandb, seed-parallel) is layered over exactly this.

Run from the repo root:
    python examples/minimal_train.py            # default backend
    python examples/minimal_train.py --cpu      # force CPU (fast compile)
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the
                                  # axon plugin registration; CLAUDE.md)

if "--cpu" in sys.argv:
    # The env-var route (JAX_PLATFORMS=cpu) does NOT override an
    # installed PJRT plugin; the config update must run before any
    # backend init (CLAUDE.md).
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.config import ReplayConfig, get_config
from nlbac_tpu.train.driver import create_replays, make_episode_runner


def main():
    # 1. a preset, scaled down so first compile is quick
    cfg = get_config("unicycle")
    cfg = dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, max_episode_steps=200),
        sac=dataclasses.replace(cfg.sac, start_steps=100),
        replay=ReplayConfig(capacity=4096, node_capacity=4096),
    )

    # 2. all mutable training state is ONE device pytree; replays are
    # preallocated on-device ring buffers
    key = jax.random.PRNGKey(cfg.run.seed)
    key, kinit = jax.random.split(key)
    ts = create_train_state(cfg, kinit)
    rl, node = create_replays(cfg)

    # 3. one jitted function runs a WHOLE episode (env steps, replay
    # pushes, gradient updates, backup supervisor) as one XLA program
    run_episode = jax.jit(make_episode_runner(cfg))

    total = jnp.int32(0)
    for ep in range(5):
        key, kep = jax.random.split(key)
        ts, rl, node, m, total = run_episode(ts, rl, node, kep,
                                             jnp.int32(ep), total)
        print(f"episode {ep}: reward {float(m.reward):9.2f}  "
              f"steps {int(m.steps):4d}  "
              f"violations {float(m.num_violations):5.0f}  "
              f"updates {int(m.updates_done):4d}")

    # the state is a plain pytree: checkpoint it however you like, or
    # use nlbac_tpu.train.checkpoint.save_checkpoint for the native npz
    n_params = sum(x.size for x in jax.tree.leaves(ts.policy))
    print(f"policy has {n_params} parameters; "
          f"replay holds {int(rl.size)} transitions")


if __name__ == "__main__":
    main()
