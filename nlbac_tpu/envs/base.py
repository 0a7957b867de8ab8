"""The environment contract: the reference's de-facto env API (SURVEY.md §1
L1) as a pure-function protocol.

The reference extends gym's step 4-tuple to
``(next_obs, reward, constraint, [barrier_signal,] lyap_in_t, lyap_in_t1,
done, info)`` (UNI/envs/unicycle_env.py:66-67, README.md:80-84).  Here that
contract is a :class:`StepOut` NamedTuple so episodes compile into a single
``lax.while_loop``/``scan`` and envs ``vmap`` for free.

Each env module exposes::

    SPEC: EnvSpec                      # static dims/bounds
    reset(key) -> (EnvState, obs)
    step(state, action) -> (EnvState, StepOut)

with EnvState a NamedTuple of arrays (device-resident, functional).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class StepOut(NamedTuple):
    """One transition's outputs; the union of all variants' fields.

    ``viol_breakdown``/``cost_breakdown`` carry PVTOL's four violation
    families (obstacles, operator, y_min, y_max) — other envs put the total
    in slot 0 (PVTOL/main.py:218-231 logs the breakdowns).
    """

    obs: jnp.ndarray
    reward: jnp.ndarray  # f32 scalar
    constraint: jnp.ndarray  # f32 scalar (stability cost / Lyapunov TD tgt)
    lyap_t: jnp.ndarray  # Lyapunov-network input before the step
    lyap_t1: jnp.ndarray  # Lyapunov-network input after the step
    barrier_signal: jnp.ndarray  # f32 scalar (NBC variants; else 0)
    done: jnp.ndarray  # bool scalar
    goal_met: jnp.ndarray  # bool scalar
    reached: jnp.ndarray  # f32 scalar (CARS in-range indicator; else 0)
    num_violations: jnp.ndarray  # f32 scalar, total this step
    safety_cost: jnp.ndarray  # f32 scalar, total this step
    viol_breakdown: jnp.ndarray  # (4,) f32
    cost_breakdown: jnp.ndarray  # (4,) f32


class EnvSpec(NamedTuple):
    """Static env description the agent needs (replaces the reference's
    direct attribute reads like env.dt / env.hazards_locations /
    env.safe_action_space, UNI/sac_cbf_clf/sac_cbf_clf.py:100-111)."""

    name: str
    obs_dim: int
    action_dim: int
    state_dim: int  # physical state dim fed to the NODE
    lyap_dim: int
    dt: float
    max_episode_steps: int
    action_low: tuple
    action_high: tuple


def zeros_out(spec: EnvSpec) -> StepOut:
    """A zero-filled StepOut (useful as a scan carry initializer)."""
    f = jnp.float32
    return StepOut(
        obs=jnp.zeros((spec.obs_dim,), f),
        reward=f(0), constraint=f(0),
        lyap_t=jnp.zeros((spec.lyap_dim,), f),
        lyap_t1=jnp.zeros((spec.lyap_dim,), f),
        barrier_signal=f(0),
        done=jnp.array(False), goal_met=jnp.array(False),
        reached=f(0), num_violations=f(0), safety_cost=f(0),
        viol_breakdown=jnp.zeros((4,), f),
        cost_breakdown=jnp.zeros((4,), f),
    )
