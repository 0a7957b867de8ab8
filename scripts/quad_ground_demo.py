#!/usr/bin/env python
"""Render the quadrotor ground-start demo (PARITY.md "Epilogue (r8)").

Loads a run's best/ snapshot (--save_best goal_rate harvest of the
c=10/s1 recipe), rolls the DETERMINISTIC policy out from the EXACT
ground start (the spawn the lever-18 program was about), and writes a
GIF of the flight. On CPU — never touches the TPU tunnel, safe to run
beside a sweep.

The documented result this renders: the ep-249 best/ snapshot scores
10/10 deterministic ground-start goals (goal at step ~52, zero
violations) while the same run's final weights crash.

Usage: python scripts/quad_ground_demo.py [run_dir] [--out demo.gif]
  run_dir: directory containing actor.pkl etc. (default: the r8
           best/ snapshot archived in results/)
"""
import argparse
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
from nlbac_tpu.envs.render import render_quadrotor, save_video
from nlbac_tpu.nn import gaussian_policy_sample
from nlbac_tpu.train.checkpoint import load_model_weights

DEFAULT_RUN = ("results/r8/quad_savebest_c10_s1_after/s1/quadrotor-run1/"
               "NBC_LBAC_Quadrotor/NBC_LBAC_Quadrotor_s1/best")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", nargs="?", default=DEFAULT_RUN)
    p.add_argument("--out", default="results/r9/quad_ground_demo.gif")
    p.add_argument("--max_steps", type=int, default=200)
    args = p.parse_args()

    cfg = get_config("quadrotor")
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    ts = load_model_weights(args.run_dir, ts, include_barrier=True)
    spec = action_spec(cfg)

    # the exact ground start: INIT_STATE, jitter-free (alpha=1 of the
    # spawn curriculum; scripts/quad_ground_diagnosis.py's spawn(1.0))
    st = quad.QuadrotorState(x=jnp.asarray(quad.INIT_STATE, jnp.float32),
                             step=jnp.int32(0))
    obs = quad.get_obs(st.x)
    traj, goal_step, viol = [np.asarray(st.x)], None, 0.0
    for t in range(args.max_steps):
        _, _, a = gaussian_policy_sample(ts.policy, obs[None],
                                         jax.random.PRNGKey(t), spec)
        # preset env semantics, same as training/evaluate.py (kill
        # penalty/attitude are inert on this clean flight but matter
        # for arbitrary --run_dir weights)
        st, out = quad.step(st, a[0],
                            max_episode_steps=cfg.env.max_episode_steps,
                            kill_penalty=cfg.env.kill_penalty,
                            kill_attitude=cfg.env.kill_attitude)
        obs = out.obs
        traj.append(np.asarray(st.x))
        viol += float(out.num_violations)
        if goal_step is None and bool(out.goal_met):
            goal_step = t + 1
        if bool(out.done):
            break
    traj = np.stack(traj)
    print(f"ground-start rollout: {len(traj) - 1} steps, "
          f"goal at step {goal_step}, violations {viol:.0f}, "
          f"endpoint ({traj[-1, 0]:.2f}, {traj[-1, 2]:.2f})")

    frames = [render_quadrotor(traj[i], trajectory=traj[:i + 1])
              for i in range(len(traj))]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    out = save_video(frames, args.out, fps=25)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
