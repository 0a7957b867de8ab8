"""Simulated car-following chain as a pure-JAX stepper.

Parity with CARS/envs/simulated_cars_env.py:
- 5 cars, state [x1 v1 ... x5 v5] (10,), control = car 4's acceleration
  (1,), bounds +/-3.0, dt=0.02, 300 steps (:16-39)
- desired velocities 3.0 with car 1's modulated by -4 sin(t) (:74-75);
  accelerations kp (v_des - v) with brake terms for cars 2, 3, 5 and car
  4's zeroed; all scaled by 1.1 ("unknown part") (:77-87)
- reward = -0.5 |a|^2 / 300, +2.0 when |gap34 - 9.5| < 0.5 (:113-118,
  148-155); constraint = |gap34 - 9.5| (:144)
- violations when gap34 < 2.5 or gap45 < 2.5; cost |gap - 2.5| (:128-141)
- Lyapunov input = [x3, v3, x4, v4] before/after (:89, 108)
- obs = state with positions/100, velocities/30 (:196-211)
- reset velocities: 3.0 + ONE shared N(0, 0.5) draw; car 4 back to 3.0
  (:158-171)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nlbac_tpu.envs.base import EnvSpec, StepOut

KP = 4.0
K_BRAKE = 20.0
SHOULD_KEEP = 9.5
KEEP_THRESHOLD = 0.5
REWARD_GOAL = 2.0
GAP_MIN = 2.5
INIT_POS = np.array([42.0, 34.0, 26.0, 18.0, 10.0], np.float32)

SPEC = EnvSpec(
    name="cars", obs_dim=10, action_dim=1, state_dim=10, lyap_dim=4,
    dt=0.02, max_episode_steps=300,
    action_low=(-3.0,), action_high=(3.0,),
)


class CarsState(NamedTuple):
    x: jnp.ndarray  # (10,) [x1 v1 ... x5 v5]
    t: jnp.ndarray  # f32 sim time
    step: jnp.ndarray  # i32


def get_obs(x):
    scale = jnp.tile(jnp.array([1 / 100.0, 1 / 30.0], jnp.float32), 5)
    return x * scale


def reset(key, max_episode_steps: int = SPEC.max_episode_steps
          ) -> Tuple[CarsState, jnp.ndarray]:
    v0 = 3.0 + 0.5 * jax.random.normal(key, ())  # one shared draw (:170)
    x = jnp.zeros((10,), jnp.float32)
    x = x.at[0::2].set(INIT_POS)
    x = x.at[1::2].set(v0)
    x = x.at[7].set(3.0)  # car 4 (:171)
    st = CarsState(x=x, t=jnp.float32(0.0), step=jnp.int32(0))
    return st, get_obs(st.x)


def accelerations(x, t):
    """The four uncontrolled cars' hand-coded accelerations (+ car 4's
    zeroed slot), including the 1.1 'unknown part' scaling (:74-87)."""
    pos = x[0::2]
    vels = x[1::2]
    vels_des = 3.0 * jnp.ones(5)
    vels_des = vels_des.at[0].add(-4.0 * jnp.sin(t))
    accels = KP * (vels_des - vels)
    accels = accels.at[1].add(
        -K_BRAKE * (pos[0] - pos[1]) * (pos[0] - pos[1] < 6.5))
    accels = accels.at[2].add(
        -K_BRAKE * (pos[1] - pos[2]) * (pos[1] - pos[2] < 6.5))
    accels = accels.at[3].set(0.0)
    accels = accels.at[4].add(
        -K_BRAKE * (pos[2] - pos[4]) * (pos[2] - pos[4] < 13.0))
    return accels * 1.1


def step(state: CarsState, action, *, barrier_B: float = 0.0,
         barrier_b: float = 0.0,
         max_episode_steps: int = SPEC.max_episode_steps
         ) -> Tuple[CarsState, StepOut]:
    f32 = jnp.float32
    x = state.x
    accels = accelerations(x, state.t)

    lyap_t = x[4:8]  # [x3, v3, x4, v4] before (:89)

    f_x = jnp.zeros((10,), f32)
    f_x = f_x.at[0::2].set(x[1::2])
    f_x = f_x.at[1::2].set(accels)
    f_x = f_x.at[7].set(0.0)
    g_x = jnp.zeros((10,), f32).at[7].set(1.0)

    x_new = x + SPEC.dt * (f_x + g_x * action[0])
    t_new = state.t + SPEC.dt
    step_count = state.step + 1

    lyap_t1 = x_new[4:8]
    gap34 = x_new[4] - x_new[6]
    gap45 = x_new[6] - x_new[8]

    reward = -0.5 * jnp.abs(action[0] ** 2) / max_episode_steps
    reached = (jnp.abs(gap34 - SHOULD_KEEP) < KEEP_THRESHOLD).astype(f32)
    reward = reward + reached * REWARD_GOAL

    done = step_count >= max_episode_steps

    v34 = (gap34 < GAP_MIN).astype(f32)
    v45 = (gap45 < GAP_MIN).astype(f32)
    n_viol = v34 + v45
    cost = (v34 * jnp.abs(gap34 - GAP_MIN) + v45 * jnp.abs(gap45 - GAP_MIN))
    constraint = jnp.abs(gap34 - SHOULD_KEEP)
    barrier = jnp.where(n_viol > 0, n_viol * f32(barrier_B),
                        f32(barrier_b))

    out = StepOut(
        obs=get_obs(x_new), reward=f32(reward), constraint=f32(constraint),
        lyap_t=lyap_t, lyap_t1=lyap_t1, barrier_signal=barrier,
        done=done, goal_met=jnp.array(False), reached=reached,
        num_violations=n_viol, safety_cost=f32(cost),
        viol_breakdown=jnp.stack([n_viol, f32(0), f32(0), f32(0)]),
        cost_breakdown=jnp.stack([f32(cost), f32(0), f32(0), f32(0)]),
    )
    return CarsState(x=x_new, t=t_new, step=step_count), out


def obs_to_state(obs):
    """obs -> NODE state: unscale positions x100, velocities x30.
    Reference: CARS/sac_cbf_clf/dynamics.py:59-62."""
    scale = jnp.tile(jnp.array([100.0, 30.0], jnp.float32), 5)
    return obs * scale


def state_to_obs(state):
    """NODE state -> obs (batched): scale down. Reference:
    CARS/sac_cbf_clf/dynamics.py:69-96."""
    scale = jnp.tile(jnp.array([1 / 100.0, 1 / 30.0], jnp.float32), 5)
    return state * scale
