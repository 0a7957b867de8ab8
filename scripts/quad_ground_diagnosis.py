#!/usr/bin/env python
"""Spatial diagnosis of quadrotor ground-start failures (PARITY.md r7).

Loads a trained run's final weights and rolls the DETERMINISTIC policy
out from curriculum spawn points at several alphas (no jitter), on CPU
(never touches the TPU tunnel — safe to run beside a sweep). Prints
endpoint, attitude extrema, and a step table for the ground start.

First finding (arm I s1, lever 12): the policy scores from alpha 0.3
and 0.85 spawns but from the exact ground start commands sustained
differential thrust — omega reaches 11 rad/s and theta 5.3 rad (1.7
full turns) within 20 steps — and tumbles into the kill floor in 34
steps. The ground-start failure is an attitude blow-up in the first
~15 steps at one corner of state space, not a navigation failure.

Usage: python scripts/quad_ground_diagnosis.py <run_dir> [alpha ...]
  run_dir: the directory containing actor.pkl/config.json
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # noqa: E402 — before backend init

import jax.numpy as jnp
import numpy as np

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.agent.state import action_spec
from nlbac_tpu.config import get_config
from nlbac_tpu.envs import quadrotor as quad
from nlbac_tpu.nn import gaussian_policy_sample
from nlbac_tpu.train.checkpoint import load_model_weights


def spawn(alpha):
    """reset_curriculum's spawn point at ``alpha``, jitter-free."""
    init_pos = np.array([quad.INIT_STATE[0], quad.INIT_STATE[2]])
    goal = np.asarray(quad.GOAL)
    pos = goal + alpha * (init_pos - goal)
    pos[1] += 0.45 * 4.0 * alpha * (1.0 - alpha)
    return jnp.array([pos[0], 0, pos[1], 0, 0, 0], jnp.float32)


def rollout(ts, spec, alpha, max_steps=1000):
    st = quad.QuadrotorState(x=spawn(alpha), step=jnp.int32(0))
    obs = quad.get_obs(st.x)
    traj = [np.asarray(st.x)]
    goal = False
    for t in range(max_steps):
        _, _, a = gaussian_policy_sample(ts.policy, obs[None],
                                         jax.random.PRNGKey(t), spec)
        st, out = quad.step(st, a[0])
        obs = out.obs
        traj.append(np.asarray(st.x))
        goal = goal or bool(out.goal_met)
        if bool(out.done):
            break
    return np.array(traj), goal


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    run = sys.argv[1]
    alphas = [float(a) for a in sys.argv[2:]] or [0.3, 0.6, 0.85, 1.0]
    cfg = get_config("quadrotor")
    ts = load_model_weights(run, create_train_state(cfg,
                                                    jax.random.PRNGKey(0)))
    spec = action_spec(cfg)
    for alpha in alphas:
        traj, goal = rollout(ts, spec, alpha)
        xs, zs, th = traj[:, 0], traj[:, 2], traj[:, 4]
        d_end = np.linalg.norm(traj[-1][[0, 2]] - np.asarray(quad.GOAL))
        print(f"alpha={alpha}: steps={len(traj) - 1} goal={goal} "
              f"end=({xs[-1]:.2f},{zs[-1]:.2f}) d_goal={d_end:.2f} "
              f"z[{zs.min():.2f},{zs.max():.2f}] |th|max={abs(th).max():.2f}")
        if alpha == 1.0:
            for i in range(0, len(traj), 5):
                print(f"  t={i:3d} x={xs[i]:+.2f} z={zs[i]:+.2f} "
                      f"vz={traj[i, 3]:+.2f} th={th[i]:+.2f} "
                      f"om={traj[i, 5]:+.2f}")


if __name__ == "__main__":
    main()
