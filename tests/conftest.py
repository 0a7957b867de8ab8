"""Test config: force the CPU backend with a virtual 8-device mesh so
sharding tests run without TPU hardware (SURVEY.md §4 test strategy).

Note: the JAX_PLATFORMS env var is NOT reliable here — the axon TPU plugin
overrides it, and pytest plugins import jax before conftest runs.  The
config update below works as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
