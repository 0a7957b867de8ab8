"""Device-mesh tests on the virtual 8-device CPU mesh: seed-parallel
episodes, dp-sharded updates (GSPMD psum insertion), and graft entries."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlbac_tpu import replay as replay_lib
from nlbac_tpu.agent import create_train_state, make_agent
from nlbac_tpu.config import ReplayConfig, get_config
from nlbac_tpu.parallel import (make_dp_update, make_mesh,
                                make_seed_parallel_runner)


def tiny_cfg():
    cfg = get_config("unicycle")
    return dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, max_episode_steps=10),
        sac=dataclasses.replace(cfg.sac, hidden_dim=16, batch_size=8,
                                updates_per_step=1, start_steps=4),
        node=dataclasses.replace(cfg.node, hidden_dim=8, f_hidden_layers=1,
                                 g_hidden_layers=1, max_batch=8,
                                 update_interval=2),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )


def test_mesh_construction_and_bounds():
    assert jax.device_count() >= 8
    mesh = make_mesh((4, 2))
    assert mesh.shape == {"seed": 4, "dp": 2}
    with pytest.raises(ValueError):
        make_mesh((64, 64))


def test_seed_parallel_episode():
    cfg = tiny_cfg()
    mesh = make_mesh((8, 1))
    init_fn, run_fn = make_seed_parallel_runner(cfg, mesh, n_seeds=8)
    ts, rl, node, keys, total = init_fn(0)
    ts, rl, node, keys, m, total = run_fn(ts, rl, node, keys,
                                          jnp.int32(0), total)
    assert m.reward.shape == (8,)
    # different seeds -> different trajectories
    r = np.asarray(m.reward)
    assert len(np.unique(np.round(r, 4))) > 1
    assert np.all(np.asarray(total) == np.asarray(m.steps))


def test_dp_update_matches_single_device():
    """The dp-sharded update must produce the same numbers as the
    unsharded one (GSPMD only changes layout, not math)."""
    cfg = tiny_cfg()
    agent = make_agent(cfg)
    ts = create_train_state(cfg, jax.random.PRNGKey(0))

    rl = replay_lib.create(64, 7, 2, 2)
    from nlbac_tpu.envs import unicycle as env
    st, obs = env.reset(jax.random.PRNGKey(1))
    for i in range(20):
        a = jnp.array([1.0, 0.2])
        st, out = env.step(st, a)
        rec = replay_lib.record_from_step(obs, a, out, jnp.float32(1.0),
                                          jnp.float32(i * .02),
                                          jnp.float32((i + 1) * .02))
        rl = replay_lib.push(rl, rec)
        obs = out.obs

    batch = replay_lib.sample(rl, jax.random.PRNGKey(2),
                              cfg.sac.batch_size)
    node_batch = replay_lib.sample(rl, jax.random.PRNGKey(3),
                                   cfg.node.max_batch)
    key = jax.random.PRNGKey(4)

    ts_ref, m_ref = jax.jit(agent.update_from_batch)(ts, batch, node_batch,
                                                     key, jnp.int32(0))

    mesh = make_mesh((1, 8))
    place, dp_update = make_dp_update(cfg, mesh)
    ts_p, batch_p, node_p, key_p = place(ts, batch, node_batch, key)
    ts_dp, m_dp = dp_update(ts_p, batch_p, node_p, key_p, jnp.int32(0))

    np.testing.assert_allclose(float(m_ref["qf1_loss"]),
                               float(m_dp["qf1_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ts_ref.policy),
                    jax.tree.leaves(ts_dp.policy)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_graft_entry_points():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    action, logp, min_q, terms = out
    assert action.shape == (256, 2)
    assert terms.shape == (256, 8)
    g.dryrun_multichip(8)


def test_statistics_scalar():
    from nlbac_tpu.parallel import statistics_scalar
    x = jnp.array([1.0, 2.0, 3.0, 6.0])
    m, s, lo, hi = statistics_scalar(x, with_min_and_max=True)
    np.testing.assert_allclose(float(m), 3.0)
    np.testing.assert_allclose(float(lo), 1.0)
    np.testing.assert_allclose(float(hi), 6.0)
    np.testing.assert_allclose(float(s), np.std([1, 2, 3, 6.0]), rtol=1e-6)


def test_async_seed_runner_per_device():
    """Per-device async dispatch of the plain episode program — the fast
    seed-parallel path."""
    from nlbac_tpu.parallel import make_async_seed_runner
    cfg = tiny_cfg()
    devices = jax.devices()[:4]
    init_fn, step_fn = make_async_seed_runner(cfg, devices=devices)
    states = init_fn(0)
    assert len(states) == 4
    for ep in range(2):
        states, metrics = step_fn(states, ep)
    rewards = [float(m.reward) for m in metrics]
    assert len(rewards) == 4 and all(np.isfinite(r) for r in rewards)
    # seeds differ -> trajectories differ
    assert len(set(round(r, 4) for r in rewards)) > 1
    # states stayed on their devices
    for st, dev in zip(states, devices):
        leaf = jax.tree.leaves(st[0])[0]
        assert list(leaf.devices())[0] == dev


def test_tp_sharded_mlp_matches_replicated():
    """shard_params_tp (SURVEY §2.3 TP hook): the unchanged mlp_apply
    under jit with column/row-sharded params produces the same outputs,
    with GSPMD inserting the collectives."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nlbac_tpu.nn import mlp_apply, mlp_init
    from nlbac_tpu.parallel import make_mesh, shard_params_tp

    mesh = make_mesh((len(jax.devices()),), axis_names=("tp",))
    params = mlp_init(jax.random.PRNGKey(0), [9, 256, 256, 1])
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 9))

    ref = mlp_apply(params, x)
    sharded = shard_params_tp(params, mesh, "tp")
    got = jax.jit(mlp_apply)(sharded, x)
    # sanity: the hidden layers really are sharded
    assert not sharded["w"][0].sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_dp_training_run_matches_single_device():
    """The USER-FACING dp mode (make_dp_episode_runner / --dp): a
    multi-episode dp-sharded TRAINING RUN — replay growth, supervisor,
    lambda/rho transitions, NODE fits all inside the sharded program —
    must reproduce the single-device run to f32 tolerance, and the
    compiled program must contain real cross-device collectives."""
    from nlbac_tpu.parallel import make_dp_episode_runner
    from nlbac_tpu.train.driver import create_replays, make_episode_runner

    cfg = tiny_cfg()
    run1 = jax.jit(make_episode_runner(cfg))
    place, run_dp = make_dp_episode_runner(cfg, 8)

    ts1 = create_train_state(cfg, jax.random.PRNGKey(0))
    rl1, node1 = create_replays(cfg)
    tsd, rld, noded = place((ts1, rl1, node1))
    tot1 = jnp.int32(0)
    totd = place(jnp.int32(0))
    for ep in range(3):
        k = jax.random.PRNGKey(ep + 100)
        ts1, rl1, node1, m1, tot1 = run1(ts1, rl1, node1, k,
                                         jnp.int32(ep), tot1)
        tsd, rld, noded, md, totd = run_dp(tsd, rld, noded, k,
                                           jnp.int32(ep), totd)
        np.testing.assert_allclose(float(m1.reward), float(md.reward),
                                   rtol=2e-4, atol=1e-4)
        assert int(m1.updates_done) == int(md.updates_done)
    assert int(tsd.updates) > 0  # updates actually ran under sharding
    # the full TrainState (params, Adam moments, lambda/rho, counters)
    # agrees after 3 episodes of compounding updates
    for a, b in zip(jax.tree.leaves(ts1), jax.tree.leaves(tsd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=2e-3)
    # and the replicated replays saw identical pushes
    np.testing.assert_allclose(np.asarray(rl1.data), np.asarray(rld.data),
                               atol=1e-5)
    # GSPMD really partitioned the update: collectives in the program
    from nlbac_tpu.parallel import make_mesh
    hlo = run_dp.lower(tsd, rld, noded, jax.random.PRNGKey(0),
                       jnp.int32(0), totd).compile().as_text()
    assert "all-reduce" in hlo


def test_tp_training_run_matches_single_device():
    """The USER-FACING tp mode (make_tp_episode_runner / --tp): a
    multi-episode training run with every network's params, targets, and
    Adam moments Megatron-sharded over a ('dp'=1, 'tp'=4) mesh must
    reproduce the single-device run to f32 tolerance, with real
    collectives in the compiled program."""
    from nlbac_tpu.parallel import make_tp_episode_runner
    from nlbac_tpu.train.driver import create_replays, make_episode_runner

    cfg = tiny_cfg()
    run1 = jax.jit(make_episode_runner(cfg))
    place, run_tp = make_tp_episode_runner(cfg, tp=4)

    ts1 = create_train_state(cfg, jax.random.PRNGKey(0))
    rl1, node1 = create_replays(cfg)
    tst, rlt, nodet, tott = place((ts1, rl1, node1, jnp.int32(0)))
    # params really sharded (hidden dims divide tp=4); Adam moments carry
    # the IDENTICAL layout (same alternation over the mirrored tree)
    w0 = tst.policy["trunk"]["w"][0]
    assert not w0.sharding.is_fully_replicated
    mu_w0 = tst.opt["policy"][0].mu["trunk"]["w"][0]
    assert mu_w0.sharding == w0.sharding
    tot1 = jnp.int32(0)
    for ep in range(3):
        k = jax.random.PRNGKey(ep + 100)
        ts1, rl1, node1, m1, tot1 = run1(ts1, rl1, node1, k,
                                         jnp.int32(ep), tot1)
        tst, rlt, nodet, mt, tott = run_tp(tst, rlt, nodet, k,
                                           jnp.int32(ep), tott)
        np.testing.assert_allclose(float(m1.reward), float(mt.reward),
                                   rtol=2e-4, atol=1e-4)
        assert int(m1.updates_done) == int(mt.updates_done)
    assert int(tst.updates) > 0
    for a, b in zip(jax.tree.leaves(ts1), jax.tree.leaves(tst)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=2e-3)
    hlo = run_tp.lower(tst, rlt, nodet, jax.random.PRNGKey(0),
                       jnp.int32(0), tott).compile().as_text()
    assert "all-reduce" in hlo


def test_shard_state_tp_layouts():
    """shard_state_tp walks the full TrainState: every MLP dict gets the
    shard_params_tp layout, targets mirror their nets, and non-MLP leaves
    (counters, temperatures, Lagrangian state, replay-free scalars) stay
    replicated."""
    from nlbac_tpu.parallel import make_mesh, shard_state_tp

    cfg = tiny_cfg()
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh((1, 4), ("dp", "tp"))
    tst = shard_state_tp(ts, mesh)
    # critic and its target share a layout
    assert (tst.critic["q1"]["w"][0].sharding
            == tst.critic_target["q1"]["w"][0].sharding)
    assert not tst.critic["q1"]["w"][0].sharding.is_fully_replicated
    # NODE field nets sharded too
    assert not tst.node["f"]["w"][0].sharding.is_fully_replicated
    # scalars replicated
    assert tst.log_alpha.sharding.is_fully_replicated
    assert tst.updates.sharding.is_fully_replicated
    # tree structure untouched
    assert (jax.tree.structure(ts) == jax.tree.structure(tst))


def test_async_seed_runner_tp_groups():
    """--n_seeds x --dp x --tp TRIPLE composition: each seed trains on
    its own disjoint 4-device (dp=2, tp=2) group — batches sharded over
    'dp', params over 'tp' — and per-seed trajectories match the plain
    single-device seed runs to f32 tolerance."""
    from nlbac_tpu.parallel import make_async_seed_runner

    cfg = tiny_cfg()
    init_fn, step_fn = make_async_seed_runner(cfg, n_seeds=2, dp=2, tp=2)
    states = init_fn(0)
    assert len(states) == 2
    # params really tp-sharded per group
    assert not (states[0][0].policy["trunk"]["w"][0]
                .sharding.is_fully_replicated)
    for ep in range(2):
        states, metrics = step_fn(states, ep)
    init1, step1 = make_async_seed_runner(cfg, devices=jax.devices()[:2],
                                          n_seeds=2)
    s1 = init1(0)
    for ep in range(2):
        s1, m1 = step1(s1, ep)
    for a, b in zip(metrics, m1):
        np.testing.assert_allclose(float(a.reward), float(b.reward),
                                   rtol=2e-4, atol=1e-4)
        assert int(a.steps) == int(b.steps)


def test_dp_divisibility_validated():
    from nlbac_tpu.parallel import make_dp_episode_runner

    cfg = tiny_cfg()  # batch_size=8
    with pytest.raises(ValueError, match="divisible"):
        make_dp_episode_runner(cfg, 3)


def test_tp_param_memory_shards():
    """The tp mode's stated purpose — grown models shard — made
    concrete: under tp=8 a wide TrainState's per-device footprint is a
    fraction of the replicated one (the hidden x hidden weights, their
    targets, and both Adam moments each hold 1/8 per device)."""
    from nlbac_tpu.parallel import make_mesh, shard_state_tp

    cfg = get_config("unicycle")
    cfg = dataclasses.replace(
        cfg,
        sac=dataclasses.replace(cfg.sac, hidden_dim=512),
        node=dataclasses.replace(cfg.node, hidden_dim=64),
    )
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh((1, 8), ("dp", "tp"))
    tst = shard_state_tp(ts, mesh)

    w = tst.critic["q1"]["w"][1]  # hidden x hidden: row-sharded
    assert w.addressable_shards[0].data.nbytes == w.nbytes // 8
    mu = tst.opt["critic"][0].mu["q1"]["w"][1]  # Adam moment: same layout
    assert mu.addressable_shards[0].data.nbytes == mu.nbytes // 8

    def per_device_bytes(tree):
        return sum(x.addressable_shards[0].data.nbytes
                   for x in jax.tree.leaves(tree)
                   if hasattr(x, "addressable_shards"))

    total = sum(x.nbytes for x in jax.tree.leaves(ts))
    per_dev = per_device_bytes(tst)
    # most parameters live in hidden x hidden layers -> the sharded
    # state holds well under half the replicated bytes per device
    assert per_dev < 0.5 * total, (per_dev, total)


def test_tp_divisibility_validated():
    """A tp width that divides no layer dim would replicate EVERYTHING
    (N devices doing redundant identical work) — loud failure instead."""
    from nlbac_tpu.parallel import make_tp_episode_runner

    cfg = tiny_cfg()  # hidden_dim=16
    with pytest.raises(ValueError, match="hidden_dim"):
        make_tp_episode_runner(cfg, tp=3)
    with pytest.raises(ValueError, match="divisible"):
        make_tp_episode_runner(cfg, tp=2, dp=3)  # batch_size=8 % 3


def test_async_seed_runner_dp_groups():
    """--n_seeds x --dp composition: each seed trains dp-sharded on its
    own disjoint device group; per-seed trajectories match the plain
    single-device seed runs to f32 tolerance."""
    from nlbac_tpu.parallel import make_async_seed_runner

    cfg = tiny_cfg()
    init_fn, step_fn = make_async_seed_runner(cfg, n_seeds=2, dp=4)
    states = init_fn(0)
    assert len(states) == 2
    for ep in range(2):
        states, metrics = step_fn(states, ep)
    # reference: the dp=1 async runner with the same base seed
    init1, step1 = make_async_seed_runner(cfg, devices=jax.devices()[:2],
                                          n_seeds=2)
    s1 = init1(0)
    for ep in range(2):
        s1, m1 = step1(s1, ep)
    for a, b in zip(metrics, m1):
        np.testing.assert_allclose(float(a.reward), float(b.reward),
                                   rtol=2e-4, atol=1e-4)
        assert int(a.steps) == int(b.steps)
