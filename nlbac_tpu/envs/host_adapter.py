"""Host-environment adapter: run a host-side Python environment (e.g. the
safe-control-gym Quadrotor, README.md:66-72 — its submodule is empty in
the reference snapshot) under the same device-side step contract as the
pure-JAX envs, via ``jax.experimental.io_callback``.

The wrapped env must expose the reference's extended gym API
(README.md:80-84):

    reset() -> obs
    step(action) -> (obs, reward, constraint, [barrier_signal,]
                     lyap_t, lyap_t1, done, info)

``info`` may carry num_safety_violation / safety_cost / goal_met /
reached (and the PVTOL-style *_obstacles/_operator/_y_min/_y_max
breakdowns).  The adapter marshals everything into a fixed-shape
:class:`StepOut` so the device-side training loop is unchanged; the env
itself runs on host CPU (ordered callbacks — this mode trades throughput
for compatibility and cannot be vmapped)."""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback

from nlbac_tpu.envs.base import EnvSpec, StepOut


class HostEnvAdapter:
    def __init__(self, env: Any, spec: EnvSpec,
                 has_barrier_signal: bool = False):
        self.env = env
        self.SPEC = spec
        self.has_barrier_signal = has_barrier_signal
        self._f32 = jnp.float32

    # -- host-side marshalling ------------------------------------------

    def _host_reset(self, _):
        obs = np.asarray(self.env.reset(), np.float32)
        return obs

    def _host_step(self, action):
        out = self.env.step(np.asarray(action))
        if self.has_barrier_signal:
            (obs, reward, constraint, barrier, lyap_t, lyap_t1, done,
             info) = out
        else:
            obs, reward, constraint, lyap_t, lyap_t1, done, info = out
            barrier = 0.0
        info = info or {}
        viol = float(info.get("num_safety_violation", 0.0)
                     or sum(v for k, v in info.items()
                            if k.startswith("num_safety_violation")))
        cost = float(info.get("safety_cost", 0.0)
                     or sum(v for k, v in info.items()
                            if k.startswith("safety_cost")))
        f = np.float32
        return (np.asarray(obs, np.float32), f(reward), f(constraint),
                np.asarray(lyap_t, np.float32),
                np.asarray(lyap_t1, np.float32), f(barrier),
                np.bool_(done), np.bool_(info.get("goal_met", False)),
                f(info.get("reached", 0.0)), f(viol), f(cost))

    # -- direct host-side API (train/host_loop.py: no io_callback) ------

    def host_reset(self) -> np.ndarray:
        """Reset the wrapped env on host; returns the f32 obs."""
        return self._host_reset(None)

    def host_step(self, action: np.ndarray):
        """Step the wrapped env on host; returns the marshalled 11-tuple
        (obs, reward, constraint, lyap_t, lyap_t1, barrier, done,
        goal_met, reached, violations, safety_cost) as numpy scalars/
        arrays — the same values the io_callback path feeds StepOut."""
        return self._host_step(action)

    # -- device-side API (matches the pure-JAX env modules) -------------

    def reset(self, key, max_episode_steps: int | None = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        del max_episode_steps
        obs = io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct((self.SPEC.obs_dim,), jnp.float32),
            key, ordered=True)
        # host envs keep their own state; the device-side "state" is just
        # the step counter
        return jnp.int32(0), obs

    def step(self, state, action, *, barrier_B: float = 0.0,
             barrier_b: float = 0.0,
             max_episode_steps: int | None = None
             ) -> Tuple[jnp.ndarray, StepOut]:
        del barrier_B, barrier_b, max_episode_steps  # host env owns these
        f32 = jnp.float32
        shapes = (
            jax.ShapeDtypeStruct((self.SPEC.obs_dim,), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),  # reward
            jax.ShapeDtypeStruct((), jnp.float32),  # constraint
            jax.ShapeDtypeStruct((self.SPEC.lyap_dim,), jnp.float32),
            jax.ShapeDtypeStruct((self.SPEC.lyap_dim,), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),  # barrier
            jax.ShapeDtypeStruct((), jnp.bool_),  # done
            jax.ShapeDtypeStruct((), jnp.bool_),  # goal_met
            jax.ShapeDtypeStruct((), jnp.float32),  # reached
            jax.ShapeDtypeStruct((), jnp.float32),  # violations
            jax.ShapeDtypeStruct((), jnp.float32),  # safety cost
        )
        (obs, reward, constraint, lyap_t, lyap_t1, barrier, done,
         goal_met, reached, viol, cost) = io_callback(
            self._host_step, shapes, action, ordered=True)
        out = StepOut(
            obs=obs, reward=reward, constraint=constraint, lyap_t=lyap_t,
            lyap_t1=lyap_t1, barrier_signal=barrier, done=done,
            goal_met=goal_met, reached=reached, num_violations=viol,
            safety_cost=cost,
            viol_breakdown=jnp.stack([viol, f32(0), f32(0), f32(0)]),
            cost_breakdown=jnp.stack([cost, f32(0), f32(0), f32(0)]),
        )
        return state + 1, out


def make_host_env(env_factory: Callable[[], Any], spec: EnvSpec,
                  has_barrier_signal: bool = False) -> HostEnvAdapter:
    return HostEnvAdapter(env_factory(), spec, has_barrier_signal)
