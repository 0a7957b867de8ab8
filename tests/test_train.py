"""End-to-end episode-driver tests on tiny configs (jitted, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.config import (NodeConfig, ReplayConfig, SacConfig,
                              get_config)
from nlbac_tpu.train.driver import create_replays, make_episode_runner


def tiny_config(preset, max_steps=40, **env_over):
    cfg = get_config(preset)
    return dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, max_episode_steps=max_steps,
                                **env_over),
        sac=dataclasses.replace(cfg.sac, hidden_dim=32, batch_size=8,
                                updates_per_step=1, start_steps=10),
        node=dataclasses.replace(cfg.node, hidden_dim=16,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 mlp_hidden_layers=1, max_batch=32,
                                 update_interval=2),
        replay=ReplayConfig(capacity=512, node_capacity=512),
    )


@pytest.mark.parametrize("preset", ["unicycle", "cars", "pvtol",
                                    "nbc_unicycle", "nbc_pvtol"])
def test_episode_runs_all_variants(preset):
    cfg = tiny_config(preset)
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg)
    run = jax.jit(make_episode_runner(cfg), static_argnames=())

    total = jnp.int32(0)
    for ep in range(2):
        ts, rl, node, m, total = run(ts, rl, node,
                                     jax.random.PRNGKey(ep),
                                     jnp.int32(ep), total)
    assert int(m.steps) <= cfg.env.max_episode_steps
    assert int(total) == 2 * int(m.steps) or int(total) > 0
    assert np.isfinite(float(m.reward))
    # episode 2 must have performed updates (buffer > batch after ep 1)
    assert int(m.updates_done) > 0
    for k, v in m.train.items():
        assert np.isfinite(float(v)), (k, float(v))
    # training state advanced
    assert int(ts.updates) > 0
    # NODE buffer receives every step; RL buffer may skip backup steps
    assert int(node.size) == int(total)
    assert int(rl.size) <= int(node.size)


def test_reference_time_labels():
    """NodeConfig.reference_time_labels restores the reference's
    off-by-one-dt NODE-buffer times (CARS/main.py:90-97: RL buffer gets
    t=(step-1)*dt, NODE buffer t=step*dt); the default labels both
    buffers with the physically-consistent (step-1)*dt. The RL buffer is
    identical in both modes."""
    base = tiny_config("cars", max_steps=20)
    dt = base.env.dt
    for faithful in (False, True):
        cfg = dataclasses.replace(
            base, node=dataclasses.replace(base.node,
                                           reference_time_labels=faithful))
        ts = create_train_state(cfg, jax.random.PRNGKey(0))
        rl, node = create_replays(cfg)
        run = jax.jit(make_episode_runner(cfg))
        ts, rl, node, m, _ = run(ts, rl, node, jax.random.PRNGKey(1),
                                 jnp.int32(0), jnp.int32(0))
        n = int(m.steps)
        rl_t = np.asarray(rl.field("t"))[:n]
        node_t = np.asarray(node.field("t"))[:n]
        node_nt = np.asarray(node.field("next_t"))[:n]
        # RL buffer: physically-consistent labels in BOTH modes
        np.testing.assert_allclose(rl_t, np.arange(n) * dt, atol=1e-6)
        shift = dt if faithful else 0.0
        np.testing.assert_allclose(node_t, np.arange(n) * dt + shift,
                                   atol=1e-6)
        np.testing.assert_allclose(node_nt,
                                   (np.arange(n) + 1) * dt + shift,
                                   atol=1e-6)


def test_lagrangian_state_evolves():
    cfg = tiny_config("unicycle")
    ts = create_train_state(cfg, jax.random.PRNGKey(1))
    rl, node = create_replays(cfg)
    run = jax.jit(make_episode_runner(cfg))
    total = jnp.int32(0)
    rho0 = float(ts.lag.rho)
    for ep in range(2):
        ts, rl, node, m, total = run(ts, rl, node, jax.random.PRNGKey(ep),
                                     jnp.int32(ep), total)
    # rho grows multiplicatively with every update (twice per update with
    # the shared-backup-rho config)
    assert float(ts.lag.rho) > rho0
    # lambda ascent fired at least once (interval 8)
    assert float(jnp.max(ts.lag.lam)) >= 0.01


def test_updates_gated_until_batch_filled():
    cfg = tiny_config("unicycle", max_steps=6)  # 6 steps < batch_size 8
    ts = create_train_state(cfg, jax.random.PRNGKey(2))
    rl, node = create_replays(cfg)
    run = jax.jit(make_episode_runner(cfg))
    ts, rl, node, m, total = run(ts, rl, node, jax.random.PRNGKey(0),
                                 jnp.int32(0), jnp.int32(0))
    assert int(m.updates_done) == 0
    assert int(ts.updates) == 0


def test_deterministic_given_key():
    cfg = tiny_config("unicycle", max_steps=12)
    ts = create_train_state(cfg, jax.random.PRNGKey(3))
    rl, node = create_replays(cfg)
    run = jax.jit(make_episode_runner(cfg))
    out1 = run(ts, rl, node, jax.random.PRNGKey(7), jnp.int32(0),
               jnp.int32(0))
    out2 = run(ts, rl, node, jax.random.PRNGKey(7), jnp.int32(0),
               jnp.int32(0))
    np.testing.assert_allclose(float(out1[3].reward),
                               float(out2[3].reward))
    l1 = jax.tree.leaves(out1[0].policy)
    l2 = jax.tree.leaves(out2[0].policy)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_rl_gather_bit_equal():
    """The fused per-step RL gather (one 2B-row gather split across the
    two unrolled updates) must be bit-identical to per-update gathers:
    it draws the exact index splits agent.update would make, and the
    buffer is not written between the unrolled updates.  Measured
    noise-level on TPU (scripts/ab_fused_gather.py), kept default-off."""
    from nlbac_tpu.experimental import fused_gather_update_step

    cfg = tiny_config("unicycle", max_steps=30)
    cfg = dataclasses.replace(
        cfg, sac=dataclasses.replace(cfg.sac, updates_per_step=2))
    runs = {f: jax.jit(make_episode_runner(
                cfg, _update_step=(fused_gather_update_step(cfg) if f
                                   else None)))
            for f in (False, True)}
    outs = {}
    for f, run in runs.items():
        ts = create_train_state(cfg, jax.random.PRNGKey(0))
        rl, node = create_replays(cfg)
        for ep in range(2):  # episode 1 has updates (30 pushes > batch 8)
            ts, rl, node, m, _ = run(ts, rl, node, jax.random.PRNGKey(ep),
                                     jnp.int32(ep), jnp.int32(ep * 30))
        outs[f] = (ts, m)
    assert int(outs[True][1].updates_done) > 0
    for a, b in zip(jax.tree.leaves(outs[False][0]),
                    jax.tree.leaves(outs[True][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
