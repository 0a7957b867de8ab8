#!/usr/bin/env python
"""Add a NEW environment + constraint builder WITHOUT touching the
package — the README "Adding a new environment" recipe, runnable.

The reference's documented extension workflow is "copy the Unicycle
folder and adjust" (a fifth program copy). Here the same thing is three
small pieces registered at runtime:

1. an env module: ``SPEC`` + pure ``reset``/``step`` returning the
   extended :class:`nlbac_tpu.envs.base.StepOut` contract, plus
   ``obs_to_state``/``state_to_obs`` NODE-space adapters
   (``register_env``),
2. a CBF/CLF residual builder: ``terms`` + ``NUM_PRIMARY``/``NUM_BACKUP``
   (``register_builder``),
3. an ``NLBACConfig`` wiring dims/gammas/budgets.

The toy task: a 2-d velocity-controlled point mass must reach a goal
ring at (2, 0) from the origin while a CBF keeps it out of one hazard
disk sitting on the straight path. Trains end-to-end through the same
fused episode program as the built-in presets (train() from the CLI
module — progress.txt, checkpoints and all).

Run from the repo root:
    python examples/custom_env.py [--cpu]
"""
import os
import sys
import tempfile
from typing import NamedTuple, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the
                                  # axon plugin registration; CLAUDE.md)

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from nlbac_tpu.envs import register_env
from nlbac_tpu.envs.base import EnvSpec, StepOut
from nlbac_tpu.constraints import register_builder

# --------------------------------------------------------------------
# 1. The env module (here: a class with staticmethods; any object with
#    the contract works — a real project would use a module)
# --------------------------------------------------------------------

DT = 0.05
GOAL = jnp.array([2.0, 0.0])
GOAL_SIZE = 0.2
HAZARD = jnp.array([1.0, 0.15])
HAZARD_RADIUS = 0.35
INIT = jnp.array([0.0, 0.0])


class PointState(NamedTuple):
    x: jnp.ndarray  # (2,) position
    step: jnp.ndarray  # i32
    last_goal_dist: jnp.ndarray  # f32


class PointMassEnv:
    """2-d single integrator: x' = x + dt * u, |u_i| <= 1."""

    SPEC = EnvSpec(name="pointmass", obs_dim=2, action_dim=2,
                   state_dim=2, lyap_dim=2, dt=DT, max_episode_steps=150,
                   action_low=(-1.0, -1.0), action_high=(1.0, 1.0))

    @staticmethod
    def reset(key, max_episode_steps: int = 150
              ) -> Tuple[PointState, jnp.ndarray]:
        del key  # deterministic spawn
        st = PointState(x=INIT, step=jnp.int32(0),
                        last_goal_dist=jnp.linalg.norm(GOAL - INIT))
        return st, st.x

    @staticmethod
    def step(state: PointState, action, *, barrier_B: float = 0.0,
             barrier_b: float = 0.0, max_episode_steps: int = 150
             ) -> Tuple[PointState, StepOut]:
        del barrier_B, barrier_b  # no NBC barrier signals in this env
        f32 = jnp.float32
        x_new = state.x + DT * action
        step_count = state.step + 1

        dist_goal = jnp.linalg.norm(GOAL - x_new)
        reward = ((state.last_goal_dist - dist_goal) * 10.0
                  - 0.01 * jnp.sum(jnp.square(action)))
        goal_met = dist_goal <= GOAL_SIZE
        reward = reward + jnp.where(goal_met, f32(100.0), 0.0)
        done = jnp.logical_or(goal_met, step_count >= max_episode_steps)

        d = jnp.linalg.norm(x_new - HAZARD)
        violated = d < HAZARD_RADIUS
        cost = jnp.where(violated, (HAZARD_RADIUS - d) / HAZARD_RADIUS,
                         0.0)
        out = StepOut(
            obs=x_new, reward=f32(reward), constraint=f32(dist_goal),
            lyap_t=state.x, lyap_t1=x_new, barrier_signal=f32(0.0),
            done=done, goal_met=goal_met, reached=f32(0.0),
            num_violations=violated.astype(f32), safety_cost=f32(cost),
            viol_breakdown=jnp.stack([violated.astype(f32)] + [f32(0)] * 3),
            cost_breakdown=jnp.stack([f32(cost)] + [f32(0)] * 3),
        )
        return PointState(x=x_new, step=step_count,
                          last_goal_dist=dist_goal), out

    @staticmethod
    def obs_to_state(obs):
        return obs  # obs IS the NODE state

    @staticmethod
    def state_to_obs(state):
        return state


# --------------------------------------------------------------------
# 2. The constraint builder: 1 distance CBF + 1 CLF on the NODE's
#    one-step predicted position (the unicycle pattern without the
#    lookahead point)
# --------------------------------------------------------------------

class PointMassConstraints:
    NUM_PRIMARY = 2  # 1 CBF + 1 CLF
    NUM_BACKUP = 1  # unused (use_backup=False), sizes the λ vector

    @staticmethod
    def terms(ccfg, ncfg, node_params, field, lyap_params, obs, action,
              lyap_t, key, dt, include_clf: bool = True, **_):
        from nlbac_tpu.nn import lyapunov_apply, predict_next_state

        p = obs  # (B, 2)
        pred = predict_next_state(ncfg, node_params, p, action, dt,
                                  field=field)
        r = ccfg.collision_buffer * HAZARD_RADIUS

        def h(q):
            return 0.5 * (jnp.sum(jnp.square(q - HAZARD), axis=-1,
                                  keepdims=True) - r ** 2)

        cbf = -((h(pred) - h(p)) / dt) - ccfg.gamma_b * h(p)  # (B, 1)
        if not include_clf:
            return cbf
        l_t = jax.lax.stop_gradient(lyapunov_apply(lyap_params, lyap_t))
        l_t1 = lyapunov_apply(lyap_params, pred)
        denom = dt if ccfg.clf_time_scaled else 1.0
        clf = (l_t1 - l_t) / denom + ccfg.gamma_l * l_t  # (B, 1)
        return jnp.concatenate([cbf, clf], axis=1)


# --------------------------------------------------------------------
# 3. Register + configure + train
# --------------------------------------------------------------------

def main():
    from nlbac_tpu.config import (ConstraintConfig, EnvConfig,
                                  NLBACConfig, NodeConfig, ReplayConfig,
                                  RunConfig, SacConfig,
                                  SupervisorConfig)
    from nlbac_tpu.train.cli import train

    register_env("pointmass", PointMassEnv)
    register_builder("pointmass", PointMassConstraints)

    cfg = NLBACConfig(
        env=EnvConfig(name="pointmass", dt=DT, max_episode_steps=150),
        sac=SacConfig(hidden_dim=64, batch_size=64, start_steps=300,
                      updates_per_step=1),
        node=NodeConfig(form="control_affine", state_dim=2, action_dim=2,
                        hidden_dim=32, f_hidden_layers=1,
                        g_hidden_layers=1, update_interval=10,
                        max_batch=4096),
        constraint=ConstraintConfig(kind="pointmass", gamma_b=5.0,
                                    gamma_l=1.0, clf_time_scaled=True,
                                    use_ratio=True, use_backup=False,
                                    # enforce at 1.4x the hazard radius
                                    # so skimming the true disk is
                                    # already deep in CBF territory
                                    collision_buffer=1.4, rho_init=5.0),
        supervisor=SupervisorConfig(kind="none"),
        replay=ReplayConfig(capacity=8192, node_capacity=8192),
        run=RunConfig(seed=0, max_episodes=25, exp_name="PointMass"),
        obs_dim=2, action_dim=2, lyap_dim=2,
    )

    out = tempfile.mkdtemp(prefix="nlbac_pointmass_")
    print(f"training the registered custom env -> {out}")
    train(cfg, output_dir=out, quiet=True)

    # read back the TSV the shared harness wrote
    import numpy as np

    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(os.path.join(out, "progress.txt"))
    r = np.asarray(cols["reward_train"])
    v = np.asarray(cols["safety_cost_train"])
    print(f"episode rewards: first 3 {r[:3].round(1).tolist()} "
          f"-> last 3 {r[-3:].round(1).tolist()}")
    print(f"safety cost:     first 3 {v[:3].round(2).tolist()} "
          f"-> last 3 {v[-3:].round(2).tolist()}")
    assert np.all(np.isfinite(r)), "training diverged"
    assert r[-3:].mean() > 100, "policy did not learn the goal bonus"
    assert v[-3:].sum() == 0, "CBF did not eliminate late violations"
    print("custom env trained end-to-end through the fused episode "
          "program: goal reached, zero late safety cost")


if __name__ == "__main__":
    main()
