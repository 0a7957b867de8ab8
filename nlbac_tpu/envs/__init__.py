from nlbac_tpu.envs.base import EnvSpec, StepOut, zeros_out  # noqa: F401
from nlbac_tpu.envs import cars, pvtol, quadrotor, unicycle  # noqa: F401
from nlbac_tpu.envs.host_adapter import (  # noqa: F401
    HostEnvAdapter,
    make_host_env,
)

_ENVS = {"unicycle": unicycle, "cars": cars, "pvtol": pvtol,
         "quadrotor": quadrotor}


def get_env(name: str):
    """name -> env module (the build_env factory, UNI/build_env.py:8-15)."""
    if name not in _ENVS:
        raise ValueError(f"unknown env {name!r}; options: {list(_ENVS)}")
    return _ENVS[name]
