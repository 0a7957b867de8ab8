"""PVTOL (planar VTOL with a ground safety operator) as a pure-JAX stepper.

Parity with PVTOL/envs/pvtol_env.py:
- 7-d full state [x, y, theta, vx, vy, thrust, operator_x]; the first 6
  are the NODE dynamics state (:36, :104-122)
- dynamics f = [vx, vy, 0, -sin th * thrust, cos th * thrust - 1, 0],
  g = [[0,0],[0,0],[0,1],[0,0],[0,0],[1,0]], Euler dt=0.02 (:253-277)
- operator follows: op += 0.7 (x_new - op) (:119-122)
- reward = -1e-3 * dist(pos, goal); goal [4.5, 4.5] radius 3.5 -> +1500,
  done (:127-138); constraint = dist (:128)
- violations: 5 obstacles r=0.25 (cost (r-d)/r), operator |x-op| >= 1.0
  (cost |diff|-1), y > 100 / y < -100 (cost linear excess) (:143-212)
- obs (11,) = [x, y, cos th, sin th, vx, vy, thrust, op_x, compass,
  exp(-dist)] (get_obs); Lyapunov inputs are the FULL obs before/after
  (:82-83, 104)

NBC variant: barrier_signal = B per violated family, accumulated —
obstacles contribute per-hazard, operator/y_max/y_min once each
(NBC-PVTOL/envs/pvtol_env.py:144-231).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from nlbac_tpu.envs.base import EnvSpec, StepOut

GOAL = np.array([4.5, 4.5], np.float32)
GOAL_SIZE = 3.5
REWARD_GOAL = 1500.0
HAZARDS = np.array([[-2.5, -2.5], [-2.5, 2.5], [0.0, -3.5], [0.0, 3.5],
                    [-4.5, 0.0]], np.float32)
HAZARD_RADIUS = 0.25
OPERATOR_FOLLOW = 0.7
OPERATOR_DIST = 1.0
Y_MIN = -100.0
Y_MAX = 100.0
INIT_STATE = np.array([-4.5, -4.5, 0.0, 0.0, 0.0, 1.0, -4.5], np.float32)

SPEC = EnvSpec(
    name="pvtol", obs_dim=11, action_dim=2, state_dim=6, lyap_dim=11,
    dt=0.02, max_episode_steps=2000,
    action_low=(-3.5, -15.0), action_high=(3.5, 15.0),
)


class PvtolState(NamedTuple):
    x: jnp.ndarray  # (7,) [x, y, th, vx, vy, thrust, op_x]
    step: jnp.ndarray  # i32
    last_goal_dist: jnp.ndarray  # f32


def get_obs(x):
    th = x[2]
    c, s = jnp.cos(th), jnp.sin(th)
    rel = GOAL - x[:2]
    dist = jnp.linalg.norm(rel)
    vec = jnp.stack([rel[0] * c + rel[1] * s, -rel[0] * s + rel[1] * c])
    vec = vec / (jnp.linalg.norm(vec) + 0.001)
    return jnp.concatenate([x[:2], jnp.stack([c, s]), x[3:7], vec,
                            jnp.exp(-dist)[None]])


def reset(key, max_episode_steps: int = SPEC.max_episode_steps
          ) -> Tuple[PvtolState, jnp.ndarray]:
    del key  # deterministic reset (:230-251)
    st = PvtolState(x=INIT_STATE, step=jnp.int32(0),
                    last_goal_dist=jnp.linalg.norm(GOAL - INIT_STATE[:2]))
    return st, get_obs(st.x)


def dynamics_f(dyn):
    """f(x) for the 6-d dynamics state (:256-265)."""
    th, thrust = dyn[2], dyn[5]
    return jnp.stack([dyn[3], dyn[4], jnp.zeros_like(th),
                      -jnp.sin(th) * thrust, jnp.cos(th) * thrust - 1.0,
                      jnp.zeros_like(th)])


def step(state: PvtolState, action, *, barrier_B: float = 0.0,
         barrier_b: float = 0.0,
         max_episode_steps: int = SPEC.max_episode_steps
         ) -> Tuple[PvtolState, StepOut]:
    f32 = jnp.float32
    x = state.x
    lyap_t = get_obs(x)  # obs BEFORE the step (:104)

    dyn = x[:6]
    gu = jnp.stack([jnp.zeros(()), jnp.zeros(()), action[1], jnp.zeros(()),
                    jnp.zeros(()), action[0]])
    dyn_new = dyn + SPEC.dt * (dynamics_f(dyn) + gu)
    op_new = x[6] + OPERATOR_FOLLOW * (dyn_new[0] - x[6])
    x_new = jnp.concatenate([dyn_new, op_new[None]])
    step_count = state.step + 1

    dist_goal = jnp.linalg.norm(x_new[:2] - GOAL)
    reward = -1e-3 * dist_goal
    goal_met = dist_goal <= GOAL_SIZE
    reward = reward + jnp.where(goal_met, REWARD_GOAL, 0.0)
    done = jnp.logical_or(goal_met, step_count >= max_episode_steps)

    # obstacles
    d2 = jnp.sum(jnp.square(x_new[None, :2] - HAZARDS), axis=1)
    violated = d2 < HAZARD_RADIUS ** 2
    n_obs = jnp.sum(violated.astype(f32))
    dists = jnp.sqrt(d2)
    c_obs = jnp.sum(jnp.where(violated,
                              (HAZARD_RADIUS - dists) / HAZARD_RADIUS, 0.0))
    # operator
    diff = x_new[0] - x_new[6]
    op_viol = (jnp.abs(diff) >= OPERATOR_DIST).astype(f32)
    c_op = op_viol * (jnp.abs(diff) - OPERATOR_DIST)
    # y box
    ymax_viol = (x_new[1] > Y_MAX).astype(f32)
    c_ymax = ymax_viol * (x_new[1] - Y_MAX)
    ymin_viol = (x_new[1] < Y_MIN).astype(f32)
    c_ymin = ymin_viol * (Y_MIN - x_new[1])

    n_viol = n_obs + op_viol + ymin_viol + ymax_viol
    cost = c_obs + c_op + c_ymin + c_ymax
    # NBC: obstacles per-hazard; operator/y each once (NBC-PVTOL env)
    barrier = jnp.where(n_viol > 0, n_viol * f32(barrier_B),
                        f32(barrier_b))

    lyap_t1 = get_obs(x_new)
    out = StepOut(
        obs=lyap_t1, reward=f32(reward), constraint=f32(dist_goal),
        lyap_t=lyap_t, lyap_t1=lyap_t1, barrier_signal=barrier,
        done=done, goal_met=goal_met, reached=f32(0.0),
        num_violations=n_viol, safety_cost=f32(cost),
        viol_breakdown=jnp.stack([n_obs, op_viol, ymin_viol, ymax_viol]),
        cost_breakdown=jnp.stack([c_obs, c_op, c_ymin, c_ymax]),
    )
    new_state = PvtolState(x=x_new, step=step_count,
                           last_goal_dist=dist_goal)
    return new_state, out


def obs_to_state(obs):
    """obs (…, 11) -> full state (…, 7) [x, y, arctan2, vx, vy, thrust,
    op_x]. Reference: PVTOL/sac_cbf_clf/dynamics.py:51-71."""
    theta = jnp.arctan2(obs[..., 3], obs[..., 2])
    return jnp.concatenate(
        [obs[..., :2], theta[..., None], obs[..., 4:8]], axis=-1)


def obs_to_dynamics_state(obs):
    """obs -> 6-d NODE dynamics state (drops operator_x)."""
    return obs_to_state(obs)[..., :6]


def state_to_obs(state):
    """Full 7-d state (batched) -> 11-d obs, differentiably (used on NODE
    predictions). Reference: PVTOL/sac_cbf_clf/dynamics.py:73-140."""
    th = state[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    rel = GOAL - state[..., :2]
    dist = jnp.linalg.norm(rel, axis=-1)
    vec = jnp.stack([rel[..., 0] * c + rel[..., 1] * s,
                     -rel[..., 0] * s + rel[..., 1] * c], axis=-1)
    vec = vec / (jnp.linalg.norm(vec, axis=-1, keepdims=True) + 0.001)
    return jnp.concatenate(
        [state[..., :2], jnp.stack([c, s], axis=-1), state[..., 3:7], vec,
         jnp.exp(-dist)[..., None]], axis=-1)


def propagate_operator(op_x, next_x):
    """Operator follow law used when chaining NODE predictions.
    Reference: PVTOL/sac_cbf_clf/sac_cbf_clf.py:466-474."""
    return op_x + OPERATOR_FOLLOW * (next_x - op_x)
