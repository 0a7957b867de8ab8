"""Unicycle navigation env as a pure-JAX stepper.

Physics/reward parity with UNI/envs/unicycle_env.py:
- 3-d state [x, y, theta], 2-d action [v, omega], dt=0.02, 1200 steps
  (unicycle_env.py:26-38)
- Euler step x += dt*(f + g u) with f=0,
  g=[[cos th,0],[sin th,0],[0,1]] (:101-102, :289-298), then the
  "unknown part" disturbance x -= dt*0.1*g(x_new) @ [cos th_new, 0] (:103)
- lookahead point p(x) = [x + l_p cos th, y + l_p sin th], l_p=0.03
  (:94-98); p before/after the step are the Lyapunov inputs
- reward = -0.1 (v - 2.5)^2 + 30 (last_dist - dist) (+500 on goal) (:114-124)
- constraint (Lyapunov TD target) = dist(goal, p(x')) (:114-115)
- goal [2.5, 2.5], radius 0.3; hazards: 7 circles r=0.5 at
  1.5*[(0,0),(0,1),(0,-1),(-1,1),(-1,-1),(1,-1),(1,1)] (:27-38)
- violations: count hazards with ||p' - o||^2 < r^2; safety cost
  (r - d)/r each (:131-150)
- obs = [x, y, cos th, sin th, compass, exp(-dist2goal)] with the compass
  the ego-rotated unit vector to goal (:257-319)

NBC variant (flag ``barrier_B``): emits barrier_signal = B per violated
hazard, accumulated (NBC-UNI/envs/unicycle_env.py:50-53, 116, 141-144).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from nlbac_tpu.envs.base import EnvSpec, StepOut

L_P = 0.03
DES_V = 2.5
GOAL = np.array([2.5, 2.5], np.float32)
GOAL_SIZE = 0.3
REWARD_GOAL = 500.0
HAZARDS = 1.5 * np.array(
    [[0.0, 0.0], [0.0, 1.0], [0.0, -1.0], [-1.0, 1.0], [-1.0, -1.0],
     [1.0, -1.0], [1.0, 1.0]], np.float32)
HAZARD_RADIUS = 0.5
INIT_STATE = np.array([-2.5, -2.5, 0.0], np.float32)
INIT_CENTER = np.array([-2.47, -2.5], np.float32)

SPEC = EnvSpec(
    name="unicycle", obs_dim=7, action_dim=2, state_dim=3, lyap_dim=2,
    dt=0.02, max_episode_steps=1200,
    action_low=(-3.5, -12.0), action_high=(3.5, 12.0),
)


class UnicycleState(NamedTuple):
    x: jnp.ndarray  # (3,) [px, py, theta]
    step: jnp.ndarray  # i32
    last_goal_dist: jnp.ndarray  # f32


def _lookahead(x):
    th = x[2]
    return x[:2] + L_P * jnp.stack([jnp.cos(th), jnp.sin(th)])


def get_obs(x):
    th = x[2]
    rel = GOAL - x[:2]
    dist = jnp.linalg.norm(rel)
    c, s = jnp.cos(th), jnp.sin(th)
    # ego compass: rel @ R with R = [[c,-s],[s,c]]  (unicycle_env.py:302-319)
    vec = jnp.stack([rel[0] * c + rel[1] * s, -rel[0] * s + rel[1] * c])
    vec = vec / (jnp.linalg.norm(vec) + 0.001)
    return jnp.concatenate([x[:2], jnp.stack([c, s]), vec,
                            jnp.exp(-dist)[None]])


def reset(key, max_episode_steps: int = SPEC.max_episode_steps
          ) -> Tuple[UnicycleState, jnp.ndarray]:
    del key  # deterministic reset (unicycle_env.py:166-185)
    st = UnicycleState(x=INIT_STATE, step=jnp.int32(0),
                       last_goal_dist=jnp.linalg.norm(GOAL - INIT_CENTER))
    return st, get_obs(st.x)


def step(state: UnicycleState, action, *, barrier_B: float = 0.0,
         barrier_b: float = 0.0,
         max_episode_steps: int = SPEC.max_episode_steps
         ) -> Tuple[UnicycleState, StepOut]:
    f32 = jnp.float32
    x = state.x
    center = _lookahead(x)

    th = x[2]
    gu = jnp.stack([jnp.cos(th) * action[0], jnp.sin(th) * action[0],
                    action[1]])
    x_new = x + SPEC.dt * gu
    # disturbance uses the POST-step heading (unicycle_env.py:102-103)
    th_new = x_new[2]
    x_new = x_new - SPEC.dt * 0.1 * jnp.stack(
        [jnp.cos(th_new) * jnp.cos(th_new),
         jnp.sin(th_new) * jnp.cos(th_new), jnp.zeros_like(th_new)])

    next_center = _lookahead(x_new)
    step_count = state.step + 1

    dist_goal = jnp.linalg.norm(GOAL - next_center)
    reward = (-jnp.square(action[0] - DES_V) * 0.1
              + (state.last_goal_dist - dist_goal) * 30.0)
    goal_met = dist_goal <= GOAL_SIZE
    reward = reward + jnp.where(goal_met, REWARD_GOAL, 0.0)
    done = jnp.logical_or(goal_met, step_count >= max_episode_steps)

    d2 = jnp.sum(jnp.square(next_center[None, :] - HAZARDS), axis=1)
    violated = d2 < HAZARD_RADIUS ** 2
    n_viol = jnp.sum(violated.astype(f32))
    dists = jnp.sqrt(d2)
    cost = jnp.sum(jnp.where(violated,
                             (HAZARD_RADIUS - dists) / HAZARD_RADIUS, 0.0))
    # little_b if safe, else n*B (first violation replaces little_b,
    # the rest add; NBC unicycle_env.py:116-145)
    barrier = jnp.where(n_viol > 0, n_viol * f32(barrier_B),
                        f32(barrier_b))

    out = StepOut(
        obs=get_obs(x_new), reward=f32(reward), constraint=f32(dist_goal),
        lyap_t=center, lyap_t1=next_center, barrier_signal=barrier,
        done=done, goal_met=goal_met, reached=f32(0.0),
        num_violations=n_viol, safety_cost=f32(cost),
        viol_breakdown=jnp.stack([n_viol, f32(0), f32(0), f32(0)]),
        cost_breakdown=jnp.stack([f32(cost), f32(0), f32(0), f32(0)]),
    )
    new_state = UnicycleState(x=x_new, step=step_count,
                              last_goal_dist=dist_goal)
    return new_state, out


def obs_to_state(obs):
    """Observation -> NODE state [x, y, arctan2(sin, cos)].
    Reference: UNI/sac_cbf_clf/dynamics.py:53-58."""
    theta = jnp.arctan2(obs[..., 3], obs[..., 2])
    return jnp.stack([obs[..., 0], obs[..., 1], theta], axis=-1)


def state_to_obs(state):
    """Predicted NODE state -> full 7-d observation (batched), used to
    re-sample the policy at predicted states in the NBC variant.
    Reference: NBC-UNI/sac_cbf_clf/dynamics.py:73-140."""
    th = state[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    rel = GOAL - state[..., :2]
    dist = jnp.linalg.norm(rel, axis=-1)
    vec = jnp.stack([rel[..., 0] * c + rel[..., 1] * s,
                     -rel[..., 0] * s + rel[..., 1] * c], axis=-1)
    vec = vec / (jnp.linalg.norm(vec, axis=-1, keepdims=True) + 0.001)
    return jnp.concatenate(
        [state[..., :2], jnp.stack([c, s], axis=-1), vec,
         jnp.exp(-dist)[..., None]], axis=-1)
