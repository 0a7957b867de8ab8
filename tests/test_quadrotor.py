"""Quadrotor workload tests: physics oracle, barrier signals, normalized
NODE field, end-to-end episode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.config import ReplayConfig, get_config
from nlbac_tpu.envs import quadrotor as quad
from nlbac_tpu.nn import make_field, node_init, pack_input
from nlbac_tpu.train.driver import create_replays, make_episode_runner


def np_quad_rollout(actions):
    """Independent numpy oracle of the planar-quadrotor Euler dynamics."""
    m, L, iyy, g, dt = quad.MASS, quad.ARM, quad.IYY, 9.8, 0.02
    x = np.array([-1.0, 0.0, 0.5, 0.0, 0.0, 0.0])
    traj = []
    for a in actions:
        t_tot = (a[0] + a[1]) / m
        dx = np.array([x[1], np.sin(x[4]) * t_tot,
                       x[3], np.cos(x[4]) * t_tot - g,
                       x[5], L * (a[1] - a[0]) / iyy])
        x = x + dt * dx
        traj.append(x.copy())
    return np.array(traj)


def test_quadrotor_physics_matches_oracle():
    key = jax.random.PRNGKey(0)
    actions = jax.random.uniform(key, (100, 2),
                                 minval=0.95 * quad.HOVER_T,
                                 maxval=1.05 * quad.HOVER_T)
    st, obs = quad.reset(key)

    def body(s, a):
        s, out = quad.step(s, a)
        return s, out.obs

    _, obs_traj = jax.jit(
        lambda s, a: jax.lax.scan(body, s, a))(st, actions)
    traj = np_quad_rollout(np.asarray(actions))
    np.testing.assert_allclose(np.asarray(obs_traj), traj, rtol=1e-3,
                               atol=1e-3)


def test_quadrotor_hover_is_stationary():
    st, _ = quad.reset(jax.random.PRNGKey(0))
    hover = jnp.array([quad.HOVER_T, quad.HOVER_T])
    for _ in range(50):
        st, out = quad.step(st, hover)
    x = np.asarray(st.x)
    np.testing.assert_allclose(x[[1, 3, 5]], 0.0, atol=1e-4)  # velocities
    np.testing.assert_allclose(x[[0, 2]], [-1.0, 0.5], atol=1e-4)


def test_quadrotor_barrier_signals():
    st, _ = quad.reset(jax.random.PRNGKey(0))
    # out of range only
    st1 = st._replace(x=jnp.array([2.5, 0, 0.5, 0, 0, 0]))
    _, out = quad.step(st1, jnp.array([quad.HOVER_T, quad.HOVER_T]))
    assert float(out.barrier_signal) == -1.0
    # collision only (inside obstacle at (0, 0.75))
    st2 = st._replace(x=jnp.array([0.0, 0, 0.76, 0, 0, 0]))
    _, out2 = quad.step(st2, jnp.array([quad.HOVER_T, quad.HOVER_T]))
    assert float(out2.barrier_signal) == -10.0
    assert float(out2.num_violations) == 1.0
    # goal bonus
    st3 = st._replace(x=jnp.array([1.0, 0, 1.0, 0, 0, 0]))
    _, out3 = quad.step(st3, jnp.array([quad.HOVER_T, quad.HOVER_T]))
    assert bool(out3.goal_met) and float(out3.reward) > 240


def test_normalized_node_field_dims():
    cfg = get_config("quadrotor").node
    assert cfg.normalize and cfg.input_dim == 8
    params = node_init(jax.random.PRNGKey(0), cfg)
    field = make_field(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6))
    u = jax.random.uniform(jax.random.PRNGKey(2), (4, 2), minval=0.0,
                           maxval=0.26)
    s = pack_input(cfg, x, u)
    ds = field(params, 0.0, s)
    assert ds.shape == (4, 8)
    np.testing.assert_allclose(np.asarray(ds[:, 6:]), 0.0)
    # denormalized output actually scales with state_scale
    dx = np.asarray(ds[:, :6])
    assert np.any(np.abs(dx) > 0)


def test_quadrotor_episode_end_to_end():
    cfg = get_config("quadrotor")
    cfg = dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, max_episode_steps=30),
        sac=dataclasses.replace(cfg.sac, hidden_dim=16, batch_size=8,
                                updates_per_step=1, start_steps=5),
        node=dataclasses.replace(cfg.node, hidden_dim=8,
                                 mlp_hidden_layers=1, max_batch=16,
                                 update_interval=2),
        replay=ReplayConfig(capacity=128, node_capacity=128),
    )
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg)
    run = jax.jit(make_episode_runner(cfg))
    total = jnp.int32(0)
    for ep in range(2):
        ts, rl, node, m, total = run(ts, rl, node, jax.random.PRNGKey(ep),
                                     jnp.int32(ep), total)
    assert int(m.updates_done) > 0
    assert np.isfinite(float(m.reward))
    # learned-barrier TD trains in this preset
    assert float(m.train["barrier_td_loss"]) >= 0.0
    assert int(ts.updates) > 0


def test_quadrotor_preset_gates_node_fit():
    """The quadrotor preset freezes NODE fits after episode 100 (the
    PVTOL-family recipe, PVTOL/sac_cbf_clf/sac_cbf_clf.py:205).  Measured
    (PARITY.md): without the gate the workload shows Lagrangian collapse
    after take-off; with it the taking-off seed trains to goal 60/60 with
    zero violations over its final 60 episodes."""
    from nlbac_tpu.config import get_config

    assert get_config("quadrotor").node.fit_episode_limit == 100


def test_curriculum_reset_anneals_to_standard():
    """reset_curriculum: early episodes spawn near (but outside) the goal
    ring; at/after curriculum_episodes the spawn is bit-identical to the
    standard reset (alpha clips to 1, jitter scales to 0)."""
    key = jax.random.PRNGKey(3)
    E = 120
    st0, obs0 = quad.reset_curriculum(key, jnp.int32(0), E)
    pos0 = np.asarray(obs0)[[0, 2]]
    d_goal = np.linalg.norm(pos0 - np.asarray(quad.GOAL))
    assert quad.GOAL_SIZE < d_goal < 0.5  # near goal, not inside the ring
    np.testing.assert_allclose(np.asarray(obs0)[[1, 3, 4, 5]], 0.0)
    # mid-curriculum: strictly between goal and INIT
    _, obs_mid = quad.reset_curriculum(key, jnp.int32(E // 2), E)
    d_mid = np.linalg.norm(np.asarray(obs_mid)[[0, 2]]
                           - np.asarray(quad.GOAL))
    d_init = np.linalg.norm(np.asarray(quad.INIT_STATE)[[0, 2]]
                            - np.asarray(quad.GOAL))
    assert d_goal < d_mid < d_init
    # at and past the boundary: exactly the standard reset
    for ep in (E, E + 37):
        _, obs_end = quad.reset_curriculum(key, jnp.int32(ep), E)
        np.testing.assert_array_equal(np.asarray(obs_end),
                                      np.asarray(quad.INIT_STATE))


def test_curriculum_mix_mode():
    """mode='mix' (lever 12): bit-identical to 'anneal' during the anneal
    window; afterwards every MIX_GROUND_INTERVAL-th episode is an exact
    ground start and the rest redraw alpha ~ Uniform(0.15, 1) per episode
    (stationary mixed-height rehearsal — PARITY.md 'Quadrotor')."""
    E = 120
    d_init = np.linalg.norm(np.asarray(quad.INIT_STATE)[[0, 2]]
                            - np.asarray(quad.GOAL))
    # anneal window: mix is bit-identical to anneal (same key)
    for ep in (0, 17, E - 1):
        key = jax.random.PRNGKey(ep)
        _, obs_a = quad.reset_curriculum(key, jnp.int32(ep), E)
        _, obs_m = quad.reset_curriculum(key, jnp.int32(ep), E, mode="mix")
        np.testing.assert_array_equal(np.asarray(obs_a), np.asarray(obs_m))
    # post-anneal: exact ground starts on the deterministic cadence
    k = quad.MIX_GROUND_INTERVAL
    for ep in (E + 2 * k, E + 5 * k, 2 * E):
        assert ep % k == 0
        _, obs = quad.reset_curriculum(jax.random.PRNGKey(ep),
                                       jnp.int32(ep), E, mode="mix")
        np.testing.assert_array_equal(np.asarray(obs),
                                      np.asarray(quad.INIT_STATE))
    # post-anneal off-cadence: fresh elevated spawns, varying with the
    # key, always strictly easier than (or equal-height to) the ground
    # start and inside the safe box / clear of the obstacle
    dists = []
    for seed in range(6):
        ep = E + 3 * quad.MIX_GROUND_INTERVAL + 1  # off-cadence
        _, obs = quad.reset_curriculum(jax.random.PRNGKey(seed),
                                       jnp.int32(ep), E, mode="mix")
        x, z = float(obs[0]), float(obs[2])
        assert quad.X_RANGE[0] < x < quad.X_RANGE[1]
        assert quad.Z_RANGE[0] < z < quad.Z_RANGE[1]
        d_obs = np.linalg.norm([x - float(quad.OBSTACLE[0]),
                                z - float(quad.OBSTACLE[1])])
        assert d_obs > quad.OBSTACLE_RADIUS
        d = np.linalg.norm(np.asarray(obs)[[0, 2]] - np.asarray(quad.GOAL))
        assert quad.GOAL_SIZE < d <= d_init + 2 * quad.CURRICULUM_JITTER
        dists.append(d)
    assert np.std(dists) > 0.05  # the per-episode redraw actually varies
    # stationarity: the distribution depends on the key/cadence only,
    # not on how far past the anneal the episode index sits
    key = jax.random.PRNGKey(9)
    _, o1 = quad.reset_curriculum(key, jnp.int32(E + 1), E, mode="mix")
    _, o2 = quad.reset_curriculum(key, jnp.int32(E + 1 + 30 * k), E,
                                  mode="mix")
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_curriculum_mix_early_mode():
    """mode='mix_early' (lever 17): the exact-ground cadence runs from
    EPISODE 0 (so random warmup sees ground states); off-cadence
    episodes are bit-identical to the anneal during the window and to
    mix's uniform mixture after it."""
    E, k = 120, quad.MIX_GROUND_INTERVAL
    # cadence episodes are exact ground starts from the very beginning
    for ep in (0, k, 2 * k, E + k):
        key = jax.random.PRNGKey(ep)
        _, obs = quad.reset_curriculum(key, jnp.int32(ep), E,
                                       mode="mix_early")
        np.testing.assert_array_equal(np.asarray(obs),
                                      np.asarray(quad.INIT_STATE))
    # off-cadence pre-anneal episodes match the anneal mode exactly
    for ep in (1, 17, E - 1):
        assert ep % k != 0
        key = jax.random.PRNGKey(ep)
        _, oa = quad.reset_curriculum(key, jnp.int32(ep), E)
        _, om = quad.reset_curriculum(key, jnp.int32(ep), E,
                                      mode="mix_early")
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(om))
    # off-cadence post-anneal episodes match plain mix exactly
    ep = E + k + 1
    key = jax.random.PRNGKey(5)
    _, o_mix = quad.reset_curriculum(key, jnp.int32(ep), E, mode="mix")
    _, o_early = quad.reset_curriculum(key, jnp.int32(ep), E,
                                       mode="mix_early")
    np.testing.assert_array_equal(np.asarray(o_mix), np.asarray(o_early))


def test_curriculum_mix_alpha_min():
    """mix_alpha_min (lever 13) narrows the post-anneal mixture to the
    hard band: off-cadence spawns sit at alpha >= the bound (distance to
    goal >= bound * d_init minus the jitter margin); the ground cadence
    and the default bound's behavior are unchanged."""
    E, bound = 120, 0.8
    d_init = np.linalg.norm(np.asarray(quad.INIT_STATE)[[0, 2]]
                            - np.asarray(quad.GOAL))
    ep = E + 3 * quad.MIX_GROUND_INTERVAL + 1  # off-cadence
    for seed in range(6):
        key = jax.random.PRNGKey(seed)
        _, obs = quad.reset_curriculum(key, jnp.int32(ep), E, mode="mix",
                                       mix_alpha_min=bound)
        d = np.linalg.norm(np.asarray(obs)[[0, 2]] - np.asarray(quad.GOAL))
        # alpha >= 0.8; the arc bump (peak 0.45*4*a*(1-a) <= 0.288 at
        # a=0.8) and jitter (<= 0.05*(1-a)) perturb the straight-line
        # distance by well under 0.3
        assert d > bound * d_init - 0.3
    # ground cadence unaffected by the bound
    _, obs_g = quad.reset_curriculum(jax.random.PRNGKey(0),
                                     jnp.int32(E + quad.MIX_GROUND_INTERVAL
                                               * 2), E,
                                     mode="mix", mix_alpha_min=bound)
    np.testing.assert_array_equal(np.asarray(obs_g),
                                  np.asarray(quad.INIT_STATE))
    # explicit default bound is bit-identical to omitting it
    key = jax.random.PRNGKey(4)
    _, o1 = quad.reset_curriculum(key, jnp.int32(ep), E, mode="mix")
    _, o2 = quad.reset_curriculum(key, jnp.int32(ep), E, mode="mix",
                                  mix_alpha_min=quad.CURRICULUM_ALPHA_MIN)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # out-of-range bounds rejected at trace time
    import pytest

    for bad in (0.05, 1.0):
        with pytest.raises(ValueError, match="mix_alpha_min"):
            quad.reset_curriculum(key, jnp.int32(ep), E, mode="mix",
                                  mix_alpha_min=bad)


def test_kill_attitude_terminates_tumble():
    """kill_attitude (lever 15): a saturated-differential-thrust tumble
    terminates the moment |theta| exceeds the limit (and collects
    kill_penalty there), long before the x/z kill box; 0 leaves the
    step bit-identical; presets all default to 0."""
    from nlbac_tpu.config import PRESETS

    for name in PRESETS:
        assert get_config(name).env.kill_attitude == 0.0

    st, _ = quad.reset(jax.random.PRNGKey(0))
    # max differential torque: min thrust on motor 1, max on motor 2
    a_spin = jnp.array([quad.SPEC.action_low[0], quad.SPEC.action_high[1]],
                       jnp.float32)
    limit = float(jnp.pi / 2)
    st0 = st1 = st
    done_at = None
    for i in range(200):
        st0, out0 = quad.step(st0, a_spin)
        st1, out1 = quad.step(st1, a_spin, kill_attitude=limit,
                              kill_penalty=250.0)
        if done_at is None and bool(out1.done):
            done_at = i
            assert abs(float(st1.x[4])) > limit
            # terminal step collects the kill penalty
            np.testing.assert_allclose(float(out1.reward),
                                       float(out0.reward) - 250.0)
            break
        # before the attitude limit the augmented step is bit-identical
        np.testing.assert_array_equal(np.asarray(out0.obs),
                                      np.asarray(out1.obs))
        np.testing.assert_array_equal(float(out0.reward),
                                      float(out1.reward))
        assert not bool(out0.done)
    assert done_at is not None, "spin must trip the attitude kill"
    assert done_at < 40  # tumble onset is fast (PARITY diagnosis: <20)

    # driver wiring: rejected for envs whose step lacks the kwarg
    import pytest

    cfg = get_config("unicycle")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, kill_attitude=1.0))
    with pytest.raises(ValueError, match="kill_attitude"):
        make_episode_runner(cfg)

    # CLI plumbs through
    from nlbac_tpu.train.cli import build_parser, config_from_args

    args = build_parser().parse_args(
        ["--preset", "quadrotor", "--kill_attitude", "1.57"])
    assert config_from_args(args).env.kill_attitude == 1.57


def test_curriculum_mix_mode_wiring():
    """--spawn_curriculum_mode plumbs CLI -> EnvConfig -> driver; presets
    default to 'anneal'; the driver rejects mix without a curriculum
    window and unknown modes at runner-build time."""
    import pytest

    from nlbac_tpu.config import PRESETS
    from nlbac_tpu.train.cli import build_parser, config_from_args

    for name in PRESETS:
        assert get_config(name).env.spawn_curriculum_mode == "anneal"

    args = build_parser().parse_args(
        ["--preset", "quadrotor", "--spawn_curriculum_episodes", "120",
         "--spawn_curriculum_mode", "mix"])
    cfg = config_from_args(args)
    assert cfg.env.spawn_curriculum_mode == "mix"
    assert cfg.env.spawn_curriculum_episodes == 120

    base = get_config("quadrotor")
    cfg = dataclasses.replace(
        base, env=dataclasses.replace(base.env, spawn_curriculum_mode="mix"))
    with pytest.raises(ValueError, match="spawn_curriculum_episodes"):
        make_episode_runner(cfg)
    cfg = dataclasses.replace(
        base, env=dataclasses.replace(base.env, spawn_curriculum_episodes=50,
                                      spawn_curriculum_mode="typo"))
    with pytest.raises(ValueError, match="spawn_curriculum_mode"):
        make_episode_runner(cfg)

    # --spawn_mix_alpha_min plumbs through; rejected when mode != mix
    args = build_parser().parse_args(
        ["--preset", "quadrotor", "--spawn_curriculum_episodes", "120",
         "--spawn_curriculum_mode", "mix", "--spawn_mix_alpha_min", "0.6"])
    assert config_from_args(args).env.spawn_mix_alpha_min == 0.6
    cfg = dataclasses.replace(
        base, env=dataclasses.replace(base.env, spawn_curriculum_episodes=50,
                                      spawn_mix_alpha_min=0.6))
    with pytest.raises(ValueError, match="spawn_mix_alpha_min"):
        make_episode_runner(cfg)


def test_curriculum_spawn_inside_safe_range():
    """Every curriculum spawn lies inside the constraint box and outside
    the obstacle, across the episode sweep and key draws."""
    E = 120
    for ep in range(0, E + 1, 10):
        for seed in range(3):
            _, obs = quad.reset_curriculum(jax.random.PRNGKey(seed),
                                           jnp.int32(ep), E)
            x, z = float(obs[0]), float(obs[2])
            assert quad.X_RANGE[0] < x < quad.X_RANGE[1]
            assert quad.Z_RANGE[0] < z < quad.Z_RANGE[1]
            d_obs = np.linalg.norm([x - float(quad.OBSTACLE[0]),
                                    z - float(quad.OBSTACLE[1])])
            assert d_obs > quad.OBSTACLE_RADIUS


def test_curriculum_driver_wiring():
    """spawn_curriculum_episodes>0 routes the driver through
    reset_curriculum (episode 0 starts near the goal); the default (0)
    keeps the standard reset. Presets all default to 0."""
    import dataclasses as dc

    from nlbac_tpu.config import PRESETS

    for name in PRESETS:
        assert get_config(name).env.spawn_curriculum_episodes == 0

    cfg = get_config("quadrotor")
    cfg = dc.replace(
        cfg,
        env=dc.replace(cfg.env, max_episode_steps=5,
                       spawn_curriculum_episodes=100),
        sac=dc.replace(cfg.sac, hidden_dim=8, batch_size=4,
                       updates_per_step=0, start_steps=1000),
        node=dc.replace(cfg.node, hidden_dim=8, mlp_hidden_layers=1,
                        max_batch=8),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg)
    run = jax.jit(make_episode_runner(cfg))
    ts, rl, node, m, total = run(ts, rl, node, jax.random.PRNGKey(0),
                                 jnp.int32(0), jnp.int32(0))
    # episode 0 spawns near the goal: with hover-ish random warmup actions
    # over 5 steps the accumulated |reward| stays far below the standard
    # spawn's ~2.06-per-step distance cost (5 * 2.06 ~ 10.3; near-goal
    # spawn gives ~0.3-0.5 per step, possibly +250 if it drifts in)
    r = float(m.reward)
    assert r > -5.0


def test_kill_penalty_applies_only_on_kill():
    """kill_penalty subtracts from the reward exactly on the kill-box
    termination step, and 0 leaves the reward bit-identical. The penalty
    removes the dive-into-the-ground local optimum documented in
    PARITY.md (crash return ~ -65 beats hovering ~ -190 without it);
    since r5 the quadrotor preset ships the measured-best recipe
    kill_penalty=250 + target_entropy=-6.0 + rho_max=50 (levers 5+7+8,
    the only post-parity-fix configuration with durable take-off);
    every reference preset keeps kill_penalty=0 (no such term in the
    reference rewards) and the reference's hardcoded rho cap of 200
    (sac_cbf_clf.py:523)."""
    from nlbac_tpu.config import PRESETS

    for name in PRESETS:
        cfg = get_config(name)
        if name == "quadrotor":
            assert cfg.env.kill_penalty == 250.0
            assert cfg.sac.target_entropy == -6.0
            assert cfg.constraint.rho_max == 50.0
        else:
            assert cfg.env.kill_penalty == 0.0
            assert cfg.sac.target_entropy is None
            assert cfg.constraint.rho_max == 200.0

    # Dive: zero thrust-ish (min action) from the spawn crashes through
    # z < -0.5 within ~40 steps.
    st, _ = quad.reset(jax.random.PRNGKey(0))
    a_min = jnp.array(quad.SPEC.action_low, jnp.float32)
    rew0, rew_p, killed_step = [], [], None
    st0 = st1 = st
    for i in range(60):
        st0, out0 = quad.step(st0, a_min)
        st1, out1 = quad.step(st1, a_min, kill_penalty=250.0)
        rew0.append(float(out0.reward))
        rew_p.append(float(out1.reward))
        if bool(out0.done):
            killed_step = i
            break
    assert killed_step is not None, "min-thrust dive must hit the kill box"
    # identical until the kill step; exactly -250 different at it
    np.testing.assert_array_equal(rew0[:-1], rew_p[:-1])
    np.testing.assert_allclose(rew_p[-1], rew0[-1] - 250.0, rtol=1e-6)


def test_kill_penalty_driver_wiring():
    """EnvConfig.kill_penalty>0 reaches the compiled episode program: a
    forced-dive episode (spawn falling at vz=-4 just above the kill box —
    unrecoverable at +/-30%-hover thrust authority) returns exactly
    kill_penalty less than the same episode with the penalty off.
    Trajectories are bit-identical (same params/PRNG, no updates), so the
    return difference isolates the killed-branch term."""
    import dataclasses as dc
    from types import SimpleNamespace

    def dive_reset(key, max_episode_steps=quad.SPEC.max_episode_steps):
        del key
        x = jnp.array([-1.0, 0.0, 0.3, -4.0, 0.0, 0.0], jnp.float32)
        return quad.QuadrotorState(x=x, step=jnp.int32(0)), quad.get_obs(x)

    dive_env = SimpleNamespace(
        SPEC=quad.SPEC, reset=dive_reset, step=quad.step,
        obs_to_state=quad.obs_to_state, state_to_obs=quad.state_to_obs)

    base = get_config("quadrotor")
    base = dc.replace(
        base,
        env=dc.replace(base.env, max_episode_steps=30),
        sac=dc.replace(base.sac, hidden_dim=8, batch_size=4,
                       updates_per_step=0, start_steps=0),
        node=dc.replace(base.node, hidden_dim=8, mlp_hidden_layers=1,
                        max_batch=8),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    results = {}
    for pen in (0.0, 123.0):
        cfg = dc.replace(base, env=dc.replace(base.env, kill_penalty=pen))
        ts = create_train_state(cfg, jax.random.PRNGKey(0))
        rl, node = create_replays(cfg)
        run = jax.jit(make_episode_runner(cfg, env_override=dive_env))
        _, _, _, m, _ = run(ts, rl, node, jax.random.PRNGKey(0),
                            jnp.int32(0), jnp.int32(0))
        results[pen] = (float(m.reward), int(m.steps))
    # the dive hits the kill box well before the 30-step limit...
    assert results[0.0][1] < 30
    # ...on the same step in both programs...
    assert results[0.0][1] == results[123.0][1]
    # ...and the penalty is the only difference in the return
    np.testing.assert_allclose(results[123.0][0], results[0.0][0] - 123.0,
                               rtol=1e-5)


def test_kill_penalty_rejected_for_envs_without_it():
    """A non-quadrotor preset with kill_penalty set fails loudly at
    runner-build time instead of a TypeError deep inside the jit trace
    (and instead of silently ignoring the flag)."""
    import dataclasses as dc

    import pytest

    cfg = get_config("unicycle")
    cfg = dc.replace(cfg, env=dc.replace(cfg.env, kill_penalty=100.0))
    with pytest.raises(ValueError, match="kill_penalty"):
        make_episode_runner(cfg)

    cfg = get_config("pvtol")
    cfg = dc.replace(cfg,
                     env=dc.replace(cfg.env, spawn_curriculum_episodes=50))
    with pytest.raises(ValueError, match="reset_curriculum"):
        make_episode_runner(cfg)


def test_curriculum_zero_episodes_rejected_and_breakdown_total():
    """r9 review guards: reset_curriculum(curriculum_episodes=0) raises
    instead of producing NaN spawns (0/0 in the clip), and the
    violation breakdown carries the per-step TOTAL in slot 0 (the
    base.py convention the other envs follow)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from nlbac_tpu.envs import quadrotor as quad

    with pytest.raises(ValueError, match="curriculum_episodes"):
        quad.reset_curriculum(jax.random.PRNGKey(0), jnp.int32(3),
                              curriculum_episodes=0)

    # out-of-range without collision: breakdown slot 0 == total
    st = quad.QuadrotorState(
        x=jnp.array([5.0, 0.0, 1.0, 0.0, 0.0, 0.0], jnp.float32),
        step=jnp.int32(0))
    _, out = quad.step(st, jnp.zeros(2))
    bd = np.asarray(out.viol_breakdown)
    assert bd[0] == float(out.num_violations) == bd[1:].sum()
