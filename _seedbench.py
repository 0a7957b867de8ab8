"""Measure aggregate throughput of N vmapped seeds on ONE chip."""
import dataclasses
import time

import jax
import jax.numpy as jnp

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.config import get_config
from nlbac_tpu.train.cli import enable_compilation_cache
from nlbac_tpu.train.driver import create_replays, make_episode_runner

enable_compilation_cache()


def bench(n_seeds, steps=400, eps=3):
    cfg = get_config("unicycle")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=steps),
        sac=dataclasses.replace(cfg.sac, start_steps=200))
    run1 = make_episode_runner(cfg)

    keys = jax.random.split(jax.random.PRNGKey(0), n_seeds)
    ts = jax.vmap(lambda k: create_train_state(cfg, k))(keys)
    rl, node = create_replays(cfg)
    stack = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_seeds,) + x.shape), t)
    rl, node = stack(rl), stack(node)
    total = jnp.zeros((n_seeds,), jnp.int32)

    @jax.jit
    def run(ts, rl, node, keys, ep, total):
        return jax.vmap(lambda t, r, n, k, tot: run1(t, r, n, k, ep, tot))(
            ts, rl, node, keys, total)

    ks = jax.random.split(jax.random.PRNGKey(1), n_seeds)
    ts, rl, node, m, total = run(ts, rl, node, ks, jnp.int32(0), total)
    m.reward.block_until_ready()
    t0 = time.perf_counter()
    n = 0
    for ep in range(1, eps + 1):
        ks = jax.random.split(jax.random.PRNGKey(ep + 1), n_seeds)
        ts, rl, node, m, total = run(ts, rl, node, ks, jnp.int32(ep),
                                     total)
        m.reward.block_until_ready()
        n += int(jnp.sum(m.steps))
    dt = time.perf_counter() - t0
    print(f"seeds={n_seeds}: {n / dt:.0f} aggregate env-steps/s "
          f"({n / dt / n_seeds:.0f} per seed)")
    return n / dt


if __name__ == "__main__":
    for n in (1, 4, 8, 16):
        bench(n)
