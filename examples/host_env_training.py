#!/usr/bin/env python
"""Train against a HOST-side (plain numpy, gym-style) environment with
the host-loop mode + native C++ data plane + backup supervision.

Two training architectures ship in this framework:

- the fused device program (train/driver.py): the whole episode is ONE
  XLA program — the fast path for the pure-JAX envs (all presets);
- the HOST-LOOP mode (train/host_loop.py): the reference's actual
  architecture (a Python step loop around device-side updates,
  UNI/main.py:56-104) — for environments whose physics live on the host
  (safe-control-gym-style engines). The replay rings are the native C++
  host data plane; updates are ``agent.update_from_batch`` on device;
  backup-controller supervision runs the SAME pure state machines as
  the device program (train/supervisor.py).

The toy task: a 1-d point mass (obs = [x, v]) drives toward x = 1.5 but
crosses a MUD BAND at x in [0.3, 0.6] that kills its velocity — the
early policy gets stuck there, the trap supervisor detects the frozen
position window and engages the backup controller, and backup-active
transitions skip the RL ring while still reaching the NODE ring
(UNI/main.py:96-104 semantics). A ``barrier_signal`` channel marks a
forbidden region x > 2.0, so the learned-barrier (NBC-family)
constraint builder TD-trains its barrier critic from it.

Run from the repo root:
    python examples/host_env_training.py [--cpu]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the
                                  # axon plugin registration; CLAUDE.md)

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np

from nlbac_tpu.config import (EnvConfig, NodeConfig, ReplayConfig,
                              SupervisorConfig, get_config)
from nlbac_tpu.envs.base import EnvSpec
from nlbac_tpu.envs.host_adapter import HostEnvAdapter
from nlbac_tpu.train.host_loop import train_host_env

MAX_STEPS = 40


# --------------------------------------------------------------------
# 1. The host env: plain numpy, the reference's extended gym API
#    (README.md:80-84) — step() returns (obs, reward, constraint,
#    barrier_signal, lyap_t, lyap_t1, done, info)
# --------------------------------------------------------------------
class MuddyPointMass:
    GOAL = 1.5

    def __init__(self):
        self.x = self.v = 0.0
        self.steps = 0

    def reset(self):
        self.x, self.v, self.steps = 0.25, 0.1, 0
        return np.array([self.x, self.v], np.float32)

    def step(self, a):
        in_mud = 0.3 <= self.x <= 0.6
        if in_mud:  # velocity is killed; only a trickle of control
            self.v = 0.002 * float(a[0])
        else:
            self.v += 0.1 * float(a[0])
        prev = np.array([self.x, self.v], np.float32)
        self.x += 0.1 * self.v
        self.steps += 1
        obs = np.array([self.x, self.v], np.float32)
        dist = abs(self.x - self.GOAL)
        done = self.steps >= MAX_STEPS or dist < 0.05
        barrier = -1.0 if self.x > 2.0 else 0.0  # forbidden overshoot
        info = {"goal_met": dist < 0.05,
                "num_safety_violation": int(barrier < 0),
                "safety_cost": max(0.0, self.x - 2.0)}
        # lyap inputs: position error before/after the step
        return (obs, -dist, dist, barrier, prev, obs, done, info)


def main():
    # env name "identity" selects the learned-barrier builder's
    # generic host-env branch: the observation IS the NODE state,
    # so next-state prediction runs directly in obs space
    spec = EnvSpec(name="identity", obs_dim=2, action_dim=1,
                   state_dim=2, lyap_dim=2, dt=0.1,
                   max_episode_steps=MAX_STEPS,
                   action_low=(-1.0,), action_high=(1.0,))
    adapter = HostEnvAdapter(MuddyPointMass(), spec,
                             has_barrier_signal=True)

    # learned-barrier (NBC-family) constraint: no hand-written CBF —
    # the barrier critic TD-trains from the env's barrier_signal; its
    # builder has a backup branch (NUM_BACKUP=1) for the supervisor to
    # engage
    cfg = get_config("nbc_unicycle")
    cfg = dataclasses.replace(
        cfg,
        env=EnvConfig(name="identity", dt=0.1,
                      max_episode_steps=MAX_STEPS, barrier_signals=True),
        sac=dataclasses.replace(cfg.sac, hidden_dim=16, batch_size=16,
                                updates_per_step=1, start_steps=40),
        node=NodeConfig(form="mlp", state_dim=2, action_dim=1,
                        hidden_dim=16, mlp_hidden_layers=1, max_batch=32,
                        update_interval=2),
        constraint=dataclasses.replace(cfg.constraint, use_backup=True),
        # trap supervisor: a frozen 8-position window (mud!) fires after
        # 3 consecutive checks; backup runs 10 steps or until the mass
        # has moved 0.2 from the switch anchor
        supervisor=SupervisorConfig(
            kind="trap", enable_after_episodes=1, window=8, min_steps=10,
            trap_threshold=1e-3, trap_count=3, backup_max_steps=10,
            escape_distance_sq=0.04),
        replay=ReplayConfig(capacity=2048, node_capacity=2048),
        obs_dim=2, action_dim=1, lyap_dim=2,
    )

    ts, history = train_host_env(cfg, adapter, episodes=10, seed=7,
                                 quiet=False)

    total_steps = sum(h["episode_steps"] for h in history)
    engaged = sum(h["backup_steps"] for h in history)
    assert history[-1]["updates"] > 0, "no gradient updates ran"
    assert np.isfinite(history[-1]["qf1_loss"])
    assert engaged > 0, "the trap supervisor never engaged the backup"
    print(f"host-loop supervision demo OK: {total_steps} env steps, "
          f"{history[-1]['updates']} updates, backup engaged for "
          f"{engaged} steps (those transitions skipped the RL ring, "
          f"reached the NODE ring)")


if __name__ == "__main__":
    main()
