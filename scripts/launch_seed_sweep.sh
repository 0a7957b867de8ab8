#!/bin/bash
# Seed sweep: N independent seeds in one process, one seed per device,
# via the seed-parallel mesh (the TPU-native replacement for mpi_fork).
# Usage: scripts/launch_seed_sweep.sh [preset] [n_seeds] [episodes]
set -euo pipefail
cd "$(dirname "$0")/.."

PRESET="${1:-unicycle}"
N_SEEDS="${2:-4}"
EPISODES="${3:-0}"

python - "$PRESET" "$N_SEEDS" "$EPISODES" <<'EOF'
import sys
import jax
import jax.numpy as jnp
from nlbac_tpu.config import get_config
from nlbac_tpu.parallel import make_mesh, make_seed_parallel_runner

preset, n_seeds = sys.argv[1], int(sys.argv[2])
cfg = get_config(preset)
if len(sys.argv) > 3 and int(sys.argv[3]) > 0:
    import dataclasses
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run,
                                     max_episodes=int(sys.argv[3])))
n = min(n_seeds, jax.device_count())
mesh = make_mesh((n,), ("seed",))
init_fn, run_fn = make_seed_parallel_runner(cfg, mesh, n_seeds=n)
ts, rl, node, keys, total = init_fn(cfg.run.seed)
for ep in range(cfg.run.max_episodes):
    ts, rl, node, keys, m, total = run_fn(ts, rl, node, keys,
                                          jnp.int32(ep), total)
    r = [round(float(x), 1) for x in m.reward]
    print(f"episode {ep}: rewards per seed {r}", flush=True)
EOF
