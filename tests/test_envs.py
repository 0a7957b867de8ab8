"""Environment parity tests: independent numpy oracles transcribed from the
reference equations (UNI/envs/unicycle_env.py, CARS/envs/simulated_cars_env.py,
PVTOL/envs/pvtol_env.py), plus contract/jit/vmap checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlbac_tpu.envs import cars, get_env, pvtol, unicycle


# ---------------------------------------------------------------------------
# numpy oracles (hand-written from the reference's printed equations)
# ---------------------------------------------------------------------------

def np_unicycle_rollout(actions):
    """Oracle for UnicycleEnv._step."""
    dt, lp = 0.02, 0.03
    x = np.array([-2.5, -2.5, 0.0])
    last = np.linalg.norm([2.5 - (-2.47), 2.5 - (-2.5)])
    traj, rewards, violations = [], [], []
    hazards = 1.5 * np.array([[0, 0], [0, 1], [0, -1], [-1, 1], [-1, -1],
                              [1, -1], [1, 1]], float)
    for a in actions:
        g = np.array([[np.cos(x[2]), 0], [np.sin(x[2]), 0], [0, 1.0]])
        x = x + dt * (g @ a)
        g2 = np.array([[np.cos(x[2]), 0], [np.sin(x[2]), 0], [0, 1.0]])
        x = x - dt * 0.1 * (g2 @ np.array([np.cos(x[2]), 0.0]))
        nc = x[:2] + lp * np.array([np.cos(x[2]), np.sin(x[2])])
        dist = np.linalg.norm(np.array([2.5, 2.5]) - nc)
        r = -0.1 * (a[0] - 2.5) ** 2 + 30 * (last - dist)
        if dist <= 0.3:
            r += 500
        last = dist
        v = int(np.sum(np.sum((nc - hazards) ** 2, 1) < 0.25))
        traj.append(x.copy())
        rewards.append(r)
        violations.append(v)
    return np.array(traj), np.array(rewards), np.array(violations)


def np_cars_rollout(actions, v0):
    """Oracle for SimulatedCarsEnv.step."""
    dt, kp, kb = 0.02, 4.0, 20.0
    x = np.zeros(10)
    x[0::2] = [42.0, 34.0, 26.0, 18.0, 10.0]
    x[1::2] = v0
    x[7] = 3.0
    t = 0.0
    traj, rewards = [], []
    for a in actions:
        pos, vels = x[0::2], x[1::2]
        vd = 3.0 * np.ones(5)
        vd[0] -= 4 * np.sin(t)
        acc = kp * (vd - vels)
        acc[1] += -kb * (pos[0] - pos[1]) * ((pos[0] - pos[1]) < 6.5)
        acc[2] += -kb * (pos[1] - pos[2]) * ((pos[1] - pos[2]) < 6.5)
        acc[3] = 0.0
        acc[4] += -kb * (pos[2] - pos[4]) * ((pos[2] - pos[4]) < 13.0)
        acc *= 1.1
        f = np.zeros(10)
        f[0::2] = vels
        f[1::2] = acc
        f[7] = 0.0
        g = np.zeros(10)
        g[7] = 1.0
        x = x + dt * (f + g * a[0])
        t += dt
        r = -0.5 * abs(a[0] ** 2) / 300
        if abs((x[4] - x[6]) - 9.5) < 0.5:
            r += 2.0
        traj.append(x.copy())
        rewards.append(r)
    return np.array(traj), np.array(rewards)


def np_pvtol_rollout(actions):
    """Oracle for PvtolEnv._step."""
    dt = 0.02
    x = np.array([-4.5, -4.5, 0.0, 0.0, 0.0, 1.0, -4.5])
    traj, rewards = [], []
    for a in actions:
        d = x[:6].copy()
        f = np.array([d[3], d[4], 0.0, -np.sin(d[2]) * d[5],
                      np.cos(d[2]) * d[5] - 1.0, 0.0])
        g = np.array([[0, 0], [0, 0], [0, 1], [0, 0], [0, 0], [1, 0]],
                     float)
        d = d + dt * (f + g @ a)
        op = x[6] + 0.7 * (d[0] - x[6])
        x = np.concatenate([d, [op]])
        dist = np.linalg.norm(x[:2] - [4.5, 4.5])
        r = -1e-3 * dist
        if dist <= 3.5:
            r += 1500.0
        traj.append(x.copy())
        rewards.append(r)
    return np.array(traj), np.array(rewards)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def _scan_env(env, state, actions, **kw):
    def body(s, a):
        s, out = env.step(s, a, **kw)
        return s, out
    return jax.lax.scan(body, state, actions)


def test_unicycle_trajectory_matches_oracle():
    key = jax.random.PRNGKey(0)
    actions = jax.random.uniform(key, (200, 2), minval=-2.0, maxval=2.0)
    st, obs0 = unicycle.reset(key)
    _, outs = jax.jit(lambda s, a: _scan_env(unicycle, s, a))(st, actions)
    traj, rewards, violations = np_unicycle_rollout(np.asarray(actions))
    # obs carries [x, y, cos, sin, ...]
    np.testing.assert_allclose(np.asarray(outs.obs[:, :2]), traj[:, :2],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(outs.reward), rewards, atol=2e-3)
    np.testing.assert_allclose(np.asarray(outs.num_violations), violations,
                               atol=0)


def test_unicycle_obs_layout_and_reset():
    st, obs = unicycle.reset(jax.random.PRNGKey(1))
    o = np.asarray(obs)
    assert o.shape == (7,)
    np.testing.assert_allclose(o[:2], [-2.5, -2.5])
    np.testing.assert_allclose(o[2:4], [1.0, 0.0])  # cos0, sin0
    rel = np.array([5.0, 5.0])
    np.testing.assert_allclose(o[6], np.exp(-np.linalg.norm(rel)),
                               rtol=1e-5)
    # compass: theta=0 -> rotation is identity transpose, normalized rel
    np.testing.assert_allclose(o[4:6], rel / (np.linalg.norm(rel) + 0.001),
                               rtol=1e-4)


def test_unicycle_goal_bonus_and_done():
    st, _ = unicycle.reset(jax.random.PRNGKey(2))
    st = st._replace(x=jnp.array([2.4, 2.4, 0.0]),
                     last_goal_dist=jnp.float32(0.5))
    st2, out = unicycle.step(st, jnp.array([0.0, 0.0]))
    assert bool(out.goal_met) and bool(out.done)
    assert float(out.reward) > 400


def test_unicycle_obs_state_roundtrip():
    x = jnp.array([[0.3, -0.7, 1.2], [2.0, 1.0, -2.5]])
    obs = unicycle.state_to_obs(x)
    back = unicycle.obs_to_state(obs)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_cars_trajectory_matches_oracle():
    key = jax.random.PRNGKey(3)
    actions = jax.random.uniform(key, (300, 1), minval=-3.0, maxval=3.0)
    st, _ = cars.reset(jax.random.PRNGKey(4))
    v0 = float(st.x[1])
    _, outs = jax.jit(lambda s, a: _scan_env(cars, s, a))(st, actions)
    traj, rewards = np_cars_rollout(np.asarray(actions), v0)
    np.testing.assert_allclose(np.asarray(outs.obs) *
                               np.tile([100.0, 30.0], 5), traj, atol=2e-3)
    np.testing.assert_allclose(np.asarray(outs.reward), rewards, atol=1e-4)
    assert bool(outs.done[-1]) and not bool(outs.done[-2])


def test_cars_reset_shared_velocity_draw():
    st, obs = cars.reset(jax.random.PRNGKey(5))
    v = np.asarray(st.x[1::2])
    assert v[0] == v[1] == v[2] == v[4]  # one shared normal draw
    assert v[3] == 3.0  # car 4 reset to 3.0
    np.testing.assert_allclose(np.asarray(obs[0::2]) * 100.0,
                               [42, 34, 26, 18, 10], rtol=1e-5)


def test_cars_scaling_roundtrip():
    st, obs = cars.reset(jax.random.PRNGKey(6))
    np.testing.assert_allclose(np.asarray(cars.obs_to_state(obs)),
                               np.asarray(st.x), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cars.state_to_obs(cars.obs_to_state(obs))),
        np.asarray(obs), rtol=1e-5)


def test_pvtol_trajectory_matches_oracle():
    key = jax.random.PRNGKey(7)
    actions = jax.random.uniform(key, (400, 2),
                                 minval=jnp.array([-3.5, -15.0]),
                                 maxval=jnp.array([3.5, 15.0]))
    st, _ = pvtol.reset(key)
    _, outs = jax.jit(lambda s, a: _scan_env(pvtol, s, a))(st, actions)
    traj, rewards = np_pvtol_rollout(np.asarray(actions))
    np.testing.assert_allclose(np.asarray(outs.obs[:, :2]), traj[:, :2],
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(outs.obs[:, 7]), traj[:, 6],
                               atol=5e-3)  # operator follows
    np.testing.assert_allclose(np.asarray(outs.reward), rewards, atol=2e-2)


def test_pvtol_violation_families():
    st, _ = pvtol.reset(jax.random.PRNGKey(8))
    # place on an obstacle, too far from operator, above y_max
    st = st._replace(x=jnp.array([-2.5, 101.0, 0.0, 0.0, 0.0, 1.0, -9.0]))
    # one step with zero action: y stays > 100, x ~ -2.5 (op far)
    _, out = pvtol.step(st, jnp.array([0.0, 0.0]))
    bd = np.asarray(out.viol_breakdown)
    assert bd[1] == 1  # operator
    assert bd[3] == 1  # y_max
    assert float(out.num_violations) == bd.sum()


def test_pvtol_obs_state_roundtrip():
    x = jnp.array([[0.3, -0.7, 1.2, 0.1, -0.2, 0.9, 0.25]])
    obs = pvtol.state_to_obs(x)
    back = pvtol.obs_to_state(obs)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    assert np.asarray(pvtol.obs_to_dynamics_state(obs)).shape == (1, 6)


def test_barrier_signals_nbc_mode():
    st, _ = unicycle.reset(jax.random.PRNGKey(9))
    st = st._replace(x=jnp.array([0.0, 0.0, 0.0]))  # on hazard (0,0)
    _, out = unicycle.step(st, jnp.array([0.0, 0.0]), barrier_B=-20.0)
    assert float(out.barrier_signal) == -20.0 * float(out.num_violations)
    assert float(out.num_violations) >= 1


def test_barrier_signal_little_b():
    """Reference NBC semantics (unicycle_env.py:116-145): the signal is
    little_b when NO barrier is violated; the first violation REPLACES
    little_b with capital_b (so n violations give n*B, not b + n*B)."""
    # violating step: little_b must not leak into the signal
    st, _ = unicycle.reset(jax.random.PRNGKey(9))
    st = st._replace(x=jnp.array([0.0, 0.0, 0.0]))  # on hazard (0,0)
    _, out = unicycle.step(st, jnp.array([0.0, 0.0]), barrier_B=-20.0,
                           barrier_b=0.5)
    assert float(out.num_violations) >= 1
    assert float(out.barrier_signal) == -20.0 * float(out.num_violations)
    # safe step: signal == little_b exactly
    st2, _ = unicycle.reset(jax.random.PRNGKey(9))
    st2 = st2._replace(x=jnp.array([40.0, 40.0, 0.0]))  # far from hazards
    _, out2 = unicycle.step(st2, jnp.array([0.0, 0.0]), barrier_B=-20.0,
                            barrier_b=0.5)
    assert float(out2.num_violations) == 0
    assert float(out2.barrier_signal) == 0.5


def test_envs_vmap_batchable():
    st, _ = unicycle.reset(jax.random.PRNGKey(10))
    batch_state = jax.tree.map(lambda x: jnp.stack([x] * 8), st)
    actions = jax.random.normal(jax.random.PRNGKey(11), (8, 2))
    new_s, outs = jax.vmap(lambda s, a: unicycle.step(s, a))(batch_state,
                                                             actions)
    assert outs.obs.shape == (8, 7)
    assert outs.reward.shape == (8,)


def test_get_env_factory():
    assert get_env("unicycle") is unicycle
    with pytest.raises(ValueError):
        get_env("quadrotor9000")


def test_live_viewer_headless_fallback():
    """mode='human' capability: on a headless host the LiveViewer warns
    once and collects frames instead of opening a window."""
    import warnings
    from nlbac_tpu.envs.render import LiveViewer

    v = LiveViewer("unicycle")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        f1 = v.show([0.0, 0.0, 0.3])
        f2 = v.show([0.5, 0.1, 0.4])
    assert any("interactive display" in str(x.message) for x in w)
    assert f1.ndim == 3 and f1.shape[2] == 3
    assert len(v.frames) == 2
    import numpy as _np
    assert not _np.array_equal(f1, f2)
    v.close()
