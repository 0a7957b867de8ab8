"""Diagnostic: move the quadrotor obstacle out of the flight corridor
(hypothesis: the obstacle at (0,0.75) on the spawn->goal reward-gradient
path is why most seeds never take off). Patch module constants BEFORE any
tracing; the episode program bakes them in as constants. The AOT cache
keys on (cfg, code hash) only, so force a distinct code-hash identity or
the run would deserialize the cached OBSTACLE program."""
import sys
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from nlbac_tpu.envs import quadrotor as quad
quad.OBSTACLE = jnp.array([0.0, -10.0], jnp.float32)  # far below ground
from nlbac_tpu.train import aot
aot._code_hash_cache = "noobstacle-diagnostic"
from nlbac_tpu.train.cli import main
main(sys.argv[1:])
