from nlbac_tpu.envs.base import EnvSpec, StepOut, zeros_out  # noqa: F401
from nlbac_tpu.envs import cars, pvtol, quadrotor, unicycle  # noqa: F401
from nlbac_tpu.envs.host_adapter import (  # noqa: F401
    HostEnvAdapter,
    make_host_env,
)
from nlbac_tpu.envs.host_shim import as_host_env  # noqa: F401

_ENVS = {"unicycle": unicycle, "cars": cars, "pvtol": pvtol,
         "quadrotor": quadrotor}


def get_env(name: str):
    """name -> env module (the build_env factory, UNI/build_env.py:8-15)."""
    if name not in _ENVS:
        raise ValueError(
            f"unknown env {name!r}; options: {list(_ENVS)}. Third-party "
            "envs must be registered with nlbac_tpu.envs.register_env "
            "in EVERY process — e.g. evaluating a custom-env run dir "
            "requires importing/registering your env module first "
            "(registration is per-process, not persisted)")
    return _ENVS[name]


def register_env(name: str, module) -> None:
    """Register a third-party env module so ``EnvConfig(name=...)``
    resolves to it — the extension point the reference lacks (its
    documented workflow is "copy the Unicycle folder and adjust";
    README.md "Adding a new environment", examples/custom_env.py).

    ``module`` is anything (a module, a SimpleNamespace, a class)
    exposing the contract of :mod:`nlbac_tpu.envs.base`::

        SPEC: EnvSpec
        reset(key, *, max_episode_steps=...) -> (EnvState, obs)
        step(state, action, *, max_episode_steps=...) -> (EnvState, StepOut)
        obs_to_state(obs) / state_to_obs(state)   # NODE-space adapters

    Re-registering the SAME object under its name is a no-op; binding a
    name to a DIFFERENT object (including a builtin env's) fails loudly
    — silent shadowing would re-route every preset using that name."""
    if name in _ENVS and _ENVS[name] is not module:
        raise ValueError(f"env name {name!r} is already registered")
    required = ("SPEC", "reset", "step", "obs_to_state", "state_to_obs")
    missing = [a for a in required if not hasattr(module, a)]
    if missing:
        raise ValueError(
            f"env module for {name!r} is missing required attributes "
            f"{missing}; see nlbac_tpu/envs/base.py for the contract")
    if not isinstance(module.SPEC, EnvSpec):
        raise ValueError(f"{name!r}.SPEC must be an EnvSpec, got "
                         f"{type(module.SPEC).__name__}")
    _ENVS[name] = module
