"""A/B: twin-Q as two MLP applies vs one stacked batched apply."""
import dataclasses, json, time
import jax, jax.numpy as jnp
from nlbac_tpu.train.cli import enable_compilation_cache
enable_compilation_cache()

def stacked_twin_q_apply(params, obs, action):
    xu = jnp.concatenate([obs, action], axis=-1)
    ws1, ws2 = params["q1"]["w"], params["q2"]["w"]
    bs1, bs2 = params["q1"]["b"], params["q2"]["b"]
    h = jnp.stack([xu, xu])  # (2, B, in)
    n = len(ws1)
    for i in range(n):
        w = jnp.stack([ws1[i], ws2[i]])  # (2, in, out)
        b = jnp.stack([bs1[i], bs2[i]])  # (2, out)
        h = jnp.einsum("kbi,kio->kbo", h, w) + b[:, None, :]
        if i < n - 1:
            h = jax.nn.relu(h)
    return h[0], h[1]

def bench(stacked, episodes=6, steps=400):
    import nlbac_tpu.nn as nn_mod
    import nlbac_tpu.nn.critics as critics_mod
    import nlbac_tpu.agent.update as update_mod
    fn = stacked_twin_q_apply if stacked else critics_mod.twin_q_apply.__wrapped__ if hasattr(critics_mod.twin_q_apply, "__wrapped__") else critics_mod.twin_q_apply
    orig = update_mod.twin_q_apply
    update_mod.twin_q_apply = fn if stacked else orig
    try:
        from nlbac_tpu.agent import create_train_state
        from nlbac_tpu.config import get_config
        from nlbac_tpu.train.driver import create_replays, make_episode_runner
        cfg = get_config("unicycle")
        cfg = dataclasses.replace(
            cfg, env=dataclasses.replace(cfg.env, max_episode_steps=steps),
            sac=dataclasses.replace(cfg.sac, start_steps=200))
        ts = create_train_state(cfg, jax.random.PRNGKey(0))
        rl, node = create_replays(cfg)
        run = jax.jit(make_episode_runner(cfg))
        total = jnp.int32(0)
        ts, rl, node, m, total = run(ts, rl, node, jax.random.PRNGKey(0), jnp.int32(0), total)
        m.reward.block_until_ready()
        t0 = time.perf_counter(); n = 0
        for ep in range(1, episodes):
            ts, rl, node, m, total = run(ts, rl, node, jax.random.PRNGKey(ep), jnp.int32(ep), total)
            m.reward.block_until_ready()
            n += int(m.steps)
        dt = time.perf_counter() - t0
        print(json.dumps({"stacked": stacked, "steps_per_sec": round(n/dt, 1),
                          "final_reward": round(float(m.reward), 2)}), flush=True)
    finally:
        update_mod.twin_q_apply = orig

bench(False); bench(True); bench(False); bench(True)
