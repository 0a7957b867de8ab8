"""NLBAC-TPU: a TPU-native JAX framework for Neural-ODE-based
Lyapunov-Barrier Actor-Critic (NLBAC) safe reinforcement learning.

Re-implements the capabilities of LiqunZhao/NLBAC (five near-identical
CUDA/torch programs, see /root/reference) as ONE library:

- ``nlbac_tpu.ode``          fixed-step + adaptive ODE solvers on ``lax.scan``
- ``nlbac_tpu.nn``           pure-functional model zoo (policy / twin-Q /
                             Lyapunov / barrier / NODE vector fields)
- ``nlbac_tpu.envs``         pure-JAX vectorizable environment steppers
- ``nlbac_tpu.replay``       on-device ring buffers
- ``nlbac_tpu.constraints``  per-env CBF/CLF residual builders
- ``nlbac_tpu.agent``        the NLBAC update step (SAC + augmented Lagrangian)
- ``nlbac_tpu.train``        episode driver, backup-controller supervisor,
                             checkpointing, logging, CLI
- ``nlbac_tpu.parallel``     device meshes, seed-/batch-parallel training
- ``nlbac_tpu.utils``        output dirs, config snapshots, plotting, eval

Everything in the compute path is jittable; the per-episode loop compiles
to a single XLA program (env stepping + replay + updates fused).
"""

__version__ = "0.1.0"

from nlbac_tpu import config  # noqa: F401
