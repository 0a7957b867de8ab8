"""Diagnostic: move the quadrotor obstacle out of the flight corridor
(hypothesis: the obstacle at (0,0.75) on the spawn->goal reward-gradient
path is why most seeds never take off). Patch module constants BEFORE any
tracing; the episode program bakes them in as constants. The AOT cache
keys on (cfg, code hash) only, so force a distinct code-hash identity or
the run would deserialize the cached OBSTACLE program."""
import sys
# NOTE: the PYTHONPATH=/root/repo ENV VAR breaks axon plugin
# registration (CLAUDE.md gotcha); this in-process sys.path insert does
# not — but always confirm the CLI's startup banner says backend=tpu in
# the run logs before comparing against TPU controls (the r4 diagnostic
# runs did).
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from nlbac_tpu.envs import quadrotor as quad
quad.OBSTACLE = jnp.array([0.0, -10.0], jnp.float32)  # far below ground
from nlbac_tpu.train import aot
aot._code_hash_cache = "noobstacle-diagnostic"
from nlbac_tpu.train.cli import main
main(sys.argv[1:])
