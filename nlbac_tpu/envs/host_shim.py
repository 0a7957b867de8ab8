"""Expose a pure-JAX env module through the reference's HOST gym API.

The reference's environments are host-side gym objects
(``reset() -> obs``; ``step(a) -> (obs, reward, constraint,
barrier_signal, lyap_t, lyap_t1, done, info)`` — README.md:80-84,
UNI/envs/unicycle_env.py:66-67).  :func:`as_host_env` wraps one of THIS
framework's pure-functional env modules (SPEC + reset/step over
pytrees) in that API and returns a ready
:class:`~nlbac_tpu.envs.host_adapter.HostEnvAdapter`, so the host-loop
training architecture (train/host_loop.py) — built for external
host-physics engines — can be driven by KNOWN physics.  That is how the
host-loop mode is validated against the fused device program on the
real presets (tests/test_runtime_native.py; PARITY.md).

The wrapped ``step`` is one jitted call per env step, pinned to the
HOST CPU backend: these are µs-scale physics kernels, and on the
default (tunneled TPU) backend every env step paid a ~30 ms dispatch +
blocking 11-field fetch round trip — the r5 cost decomposition
(scripts/probe_host_loop_cost.py) showed this was HALF the host-loop
mode's per-step wall time.  A host-API env is host physics by
definition; the fused program remains the fast path for pure-JAX envs
(DESIGN.md §1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nlbac_tpu.envs.host_adapter import HostEnvAdapter


class _HostShim:
    """The host-API view of one pure-JAX env module (stateful wrapper
    over the functional reset/step)."""

    def __init__(self, env_module, seed: int = 0, barrier_B: float = 0.0,
                 barrier_b: float = 0.0, max_episode_steps=None,
                 step_kwargs=None):
        self._env = env_module
        self._max_steps = (env_module.SPEC.max_episode_steps
                           if max_episode_steps is None
                           else int(max_episode_steps))
        # host physics runs on the host: pin the env programs AND the
        # reset key chain to the CPU backend so no env step ever
        # touches the (possibly tunneled) accelerator — see module
        # docstring for the measured cost of getting this wrong
        # every shim call runs under jax.default_device(cpu): committed-
        # input propagation alone does NOT keep the programs off a
        # tunneled default backend (measured 16 ms/step residual), and
        # jit(device=) is deprecated
        self._cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(self._cpu):
            self._key = jax.device_put(jax.random.PRNGKey(seed),
                                       self._cpu)
        self._state = None
        extra = dict(step_kwargs or {})
        self._reset = jax.jit(
            lambda k: env_module.reset(k,
                                       max_episode_steps=self._max_steps))
        self._step = jax.jit(
            lambda s, a: env_module.step(
                s, jnp.asarray(a, jnp.float32), barrier_B=barrier_B,
                barrier_b=barrier_b, max_episode_steps=self._max_steps,
                **extra))

    def reset(self):
        with jax.default_device(self._cpu):
            self._key, krst = jax.random.split(self._key)
            self._state, obs = self._reset(krst)
        return np.asarray(obs, np.float32)

    def step(self, action):
        with jax.default_device(self._cpu):
            self._state, out = self._step(self._state, action)
        # ONE batched D2H for the whole StepOut (per-field reads each
        # pay a tunnel round trip on the axon backend — CLAUDE.md)
        o = jax.device_get(out)
        info = {
            "num_safety_violation": float(o.num_violations),
            "safety_cost": float(o.safety_cost),
            "goal_met": bool(o.goal_met),
            "reached": float(o.reached),
        }
        return (np.asarray(o.obs, np.float32), float(o.reward),
                float(o.constraint), float(o.barrier_signal),
                np.asarray(o.lyap_t, np.float32),
                np.asarray(o.lyap_t1, np.float32), bool(o.done), info)


def as_host_env(env_module, seed: int = 0, barrier_B: float = 0.0,
                barrier_b: float = 0.0, max_episode_steps=None,
                step_kwargs=None) -> HostEnvAdapter:
    """Wrap ``env_module`` (a pure-JAX env module: SPEC + reset/step) in
    the reference's host gym API and return a ready
    :class:`HostEnvAdapter` for host-loop training / io_callback use.

    ``step_kwargs`` are extra static kwargs baked into the jitted step
    (the driver's opt-in kill_penalty/kill_attitude —
    train/driver.build_step_kwargs)."""
    spec = env_module.SPEC
    if max_episode_steps is not None:
        spec = spec._replace(max_episode_steps=int(max_episode_steps))
    shim = _HostShim(env_module, seed=seed, barrier_B=barrier_B,
                     barrier_b=barrier_b,
                     max_episode_steps=max_episode_steps,
                     step_kwargs=step_kwargs)
    adapter = HostEnvAdapter(shim, spec, has_barrier_signal=True)
    # Forward the module's obs -> NODE-state adapter: make_agent reads
    # `obs_to_state` off the env (identity when absent — correct only
    # for envs whose obs IS the NODE state). PVTOL's NODE adapter is
    # obs_to_dynamics_state (the registry path special-cases it;
    # agent/update.py make_agent).
    node_adapter = (getattr(env_module, "obs_to_dynamics_state", None)
                    if spec.name == "pvtol" else None)
    if node_adapter is None:
        node_adapter = getattr(env_module, "obs_to_state", None)
    if node_adapter is not None:
        adapter.obs_to_state = node_adapter
    if hasattr(env_module, "state_to_obs"):
        adapter.state_to_obs = env_module.state_to_obs
    if hasattr(env_module, "ground_probe_obs"):
        # quadrotor's fixed probe batch (SacConfig.probe_pretanh_reg,
        # lever 18) — make_agent reads it off the env it is handed
        adapter.ground_probe_obs = env_module.ground_probe_obs
    return adapter
