"""Model-zoo tests, including torch-oracle checks for the tanh-Gaussian
log-prob and Xavier init stats (torch CPU is available as an oracle; no
reference code is imported)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nlbac_tpu.config import NodeConfig
from nlbac_tpu.nn import (
    ActionSpec,
    gaussian_policy_forward,
    gaussian_policy_init,
    gaussian_policy_sample,
    lyapunov_apply,
    lyapunov_init,
    make_field,
    mlp_apply,
    mlp_init,
    node_init,
    node_train_step,
    pack_input,
    predict_next_state,
    soft_update,
    twin_q_apply,
    twin_q_init,
)


def test_xavier_uniform_bounds_and_zero_bias():
    params = mlp_init(jax.random.PRNGKey(0), [64, 256, 1])
    w = np.asarray(params["w"][0])
    a = np.sqrt(6.0 / (64 + 256))
    assert np.all(np.abs(w) <= a)
    assert np.std(w) > a / 3  # actually uniform, not degenerate
    assert np.all(np.asarray(params["b"][0]) == 0)


def test_mlp_relu_hidden_linear_out():
    params = mlp_init(jax.random.PRNGKey(1), [3, 8, 8, 2])
    x = jnp.array([[1.0, -1.0, 0.5]])
    y = mlp_apply(params, x)
    # manual forward
    h = np.asarray(x)
    for i in range(2):
        h = np.maximum(h @ np.asarray(params["w"][i])
                       + np.asarray(params["b"][i]), 0)
    h = h @ np.asarray(params["w"][2]) + np.asarray(params["b"][2])
    np.testing.assert_allclose(np.asarray(y), h, rtol=1e-5)


def test_gaussian_policy_logprob_matches_torch_oracle():
    """Check the squashed-Gaussian log-prob formula against
    torch.distributions math on the same (mean, std, noise) draw."""
    torch = pytest.importorskip("torch")
    key = jax.random.PRNGKey(2)
    params = gaussian_policy_init(key, 7, 2, 32)
    spec = ActionSpec.from_bounds(np.array([-3.5, -12.0]),
                                  np.array([3.5, 12.0]))
    obs = jax.random.normal(jax.random.PRNGKey(3), (5, 7))
    mean, log_std = gaussian_policy_forward(params, obs)

    action, logp, det = gaussian_policy_sample(params, obs,
                                               jax.random.PRNGKey(4), spec)
    # Recover the noise used and recompute with torch
    std = np.exp(np.asarray(log_std))
    y = (np.asarray(action) - np.asarray(spec.bias)) / np.asarray(spec.scale)
    x = np.arctanh(np.clip(y, -1 + 1e-7, 1 - 1e-7))
    tmean = torch.tensor(np.asarray(mean))
    tstd = torch.tensor(std)
    dist = torch.distributions.Normal(tmean, tstd)
    tlogp = dist.log_prob(torch.tensor(x))
    tlogp = tlogp - torch.log(
        torch.tensor(np.asarray(spec.scale)) * (1 - torch.tanh(
            torch.tensor(x)) ** 2) + 1e-6)
    tlogp = tlogp.sum(1, keepdim=True)
    np.testing.assert_allclose(np.asarray(logp), tlogp.numpy(), atol=1e-3)
    # deterministic head
    np.testing.assert_allclose(
        np.asarray(det),
        np.tanh(np.asarray(mean)) * np.asarray(spec.scale)
        + np.asarray(spec.bias), rtol=1e-4, atol=1e-3)


def test_action_bounds_respected():
    params = gaussian_policy_init(jax.random.PRNGKey(5), 4, 2, 16)
    spec = ActionSpec.from_bounds(np.array([-1.0, -2.0]),
                                  np.array([1.0, 2.0]))
    obs = jax.random.normal(jax.random.PRNGKey(6), (128, 4)) * 10
    action, _, _ = gaussian_policy_sample(params, obs, jax.random.PRNGKey(7),
                                          spec)
    a = np.asarray(action)
    assert np.all(a[:, 0] >= -1.0) and np.all(a[:, 0] <= 1.0)
    assert np.all(a[:, 1] >= -2.0) and np.all(a[:, 1] <= 2.0)


def test_twin_q_shapes_and_independence():
    params = twin_q_init(jax.random.PRNGKey(8), 7, 2, 32)
    obs = jnp.ones((4, 7))
    act = jnp.ones((4, 2))
    q1, q2 = twin_q_apply(params, obs, act)
    assert q1.shape == (4, 1) and q2.shape == (4, 1)
    assert not np.allclose(np.asarray(q1), np.asarray(q2))


def test_soft_update_polyak():
    p = {"w": jnp.ones((2, 2))}
    t = {"w": jnp.zeros((2, 2))}
    out = soft_update(t, p, 0.005)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.005)


def test_control_affine_field_zero_control_slots():
    cfg = NodeConfig(form="control_affine", state_dim=3, action_dim=2)
    params = node_init(jax.random.PRNGKey(9), cfg)
    field = make_field(cfg)
    s = jnp.ones((4, 5))
    ds = field(params, 0.0, s)
    assert ds.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(ds[:, 3:]), 0.0)


def test_mlp_field_time_input_dims():
    cfg = NodeConfig(form="mlp", state_dim=10, action_dim=1, hidden_dim=64,
                     time_input=True)
    params = node_init(jax.random.PRNGKey(10), cfg)
    field = make_field(cfg)
    x = jnp.ones((4, 10))
    u = jnp.ones((4, 1))
    t = jnp.ones((4, 1))
    s = pack_input(cfg, x, u, t)
    assert s.shape == (4, 12)
    ds = field(params, 0.0, s)
    assert ds.shape == (4, 12)
    np.testing.assert_allclose(np.asarray(ds[:, 10:]), 0.0)


def test_node_predict_is_one_euler_step():
    cfg = NodeConfig(form="control_affine", state_dim=3, action_dim=2)
    params = node_init(jax.random.PRNGKey(11), cfg)
    field = make_field(cfg)
    x = jax.random.normal(jax.random.PRNGKey(12), (8, 3))
    u = jax.random.normal(jax.random.PRNGKey(13), (8, 2))
    dt = 0.02
    pred = predict_next_state(cfg, params, x, u, dt, field=field)
    s0 = pack_input(cfg, x, u)
    manual = s0 + dt * field(params, 0.0, s0)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(manual[:, :3]),
                               rtol=1e-6)


def test_node_fit_learns_linear_dynamics():
    """The NODE fit should drive one-step MSE down on a simple linear
    system (the reference's README quality check, §6)."""
    cfg = NodeConfig(form="control_affine", state_dim=2, action_dim=1,
                     hidden_dim=32, f_hidden_layers=2, g_hidden_layers=2)
    params = node_init(jax.random.PRNGKey(14), cfg)
    field = make_field(cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    dt = 0.05

    # true dynamics: dx = [x1, -x0] + [0, 1] u
    key = jax.random.PRNGKey(15)
    x = jax.random.normal(key, (512, 2))
    u = jax.random.normal(jax.random.PRNGKey(16), (512, 1))
    dx = jnp.stack([x[:, 1], -x[:, 0] + u[:, 0]], axis=1)
    x_next = x + dt * dx

    step = jax.jit(lambda p, o: node_train_step(cfg, p, o, optimizer, x, u,
                                                x_next, dt, field=field))
    _, _, loss0 = step(params, opt_state)
    for _ in range(200):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < float(loss0) * 0.05, (float(loss0), float(loss))


def test_node_field_bf16_compute_option():
    """compute_dtype='bfloat16' keeps f32 inputs/outputs and stays close
    to the f32 field."""
    import dataclasses
    cfg = NodeConfig(form="control_affine", state_dim=3, action_dim=2,
                     hidden_dim=32, f_hidden_layers=2, g_hidden_layers=2)
    cfg_bf = dataclasses.replace(cfg, compute_dtype="bfloat16")
    params = node_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    u = jax.random.normal(jax.random.PRNGKey(2), (16, 2))
    s = pack_input(cfg, x, u)
    f32 = make_field(cfg)(params, 0.0, s)
    bf16 = make_field(cfg_bf)(params, 0.0, s)
    assert bf16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32),
                               atol=0.1, rtol=0.1)
    assert not np.array_equal(np.asarray(bf16), np.asarray(f32))


def test_stacked_twin_q_matches_plain():
    """The experimental stacked twin-Q layout
    (nlbac_tpu.experimental.stack_twin_q_state) stores the same numbers:
    stacked leaves are identical per network, the forward matches the
    two plain MLP applies to f32 tolerance, and stack/unstack
    round-trips exactly."""
    from nlbac_tpu.nn import twin_q_stack, twin_q_unstack

    key = jax.random.PRNGKey(8)
    plain = twin_q_init(key, 7, 2, 32)
    stacked = twin_q_stack(plain)
    # same init values, different layout
    for i, (w1, w2) in enumerate(zip(plain["q1"]["w"], plain["q2"]["w"])):
        np.testing.assert_array_equal(stacked["w"][i][0], w1)
        np.testing.assert_array_equal(stacked["w"][i][1], w2)
    obs = jax.random.normal(jax.random.PRNGKey(1), (64, 7))
    act = jax.random.normal(jax.random.PRNGKey(2), (64, 2))
    q1p, q2p = twin_q_apply(plain, obs, act)
    q1s, q2s = twin_q_apply(stacked, obs, act)
    np.testing.assert_allclose(q1s, q1p, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(q2s, q2p, rtol=1e-5, atol=1e-6)
    # layout round-trips bit-exactly
    rt = twin_q_stack(twin_q_unstack(stacked))
    for a, b in zip(jax.tree.leaves(rt), jax.tree.leaves(stacked)):
        np.testing.assert_array_equal(a, b)


def test_stacked_twin_q_episode_equivalence():
    """A full compiled episode (env + replay + updates) with the
    experimental stacked twin-Q state matches the plain layout to f32
    tolerance — the lever is a pure layout change."""
    import dataclasses as dc

    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import ReplayConfig, get_config
    from nlbac_tpu.experimental import stack_twin_q_state
    from nlbac_tpu.train.driver import create_replays, make_episode_runner

    base = get_config("unicycle")
    base = dc.replace(
        base,
        env=dc.replace(base.env, max_episode_steps=50),
        sac=dc.replace(base.sac, hidden_dim=16, batch_size=8,
                       updates_per_step=1, start_steps=10),
        node=dc.replace(base.node, hidden_dim=8, mlp_hidden_layers=1,
                        max_batch=16),
        replay=ReplayConfig(capacity=256, node_capacity=256),
    )
    rewards = {}
    for flag in (False, True):
        cfg = base
        ts = create_train_state(cfg, jax.random.PRNGKey(3))
        if flag:
            ts = stack_twin_q_state(cfg, ts)
        rl, node = create_replays(cfg)
        run = jax.jit(make_episode_runner(cfg))
        ts, rl, node, m, _ = run(ts, rl, node, jax.random.PRNGKey(4),
                                 jnp.int32(0), jnp.int32(0))
        rewards[flag] = float(m.reward)
    np.testing.assert_allclose(rewards[True], rewards[False],
                               rtol=1e-4, atol=1e-5)


def test_node_form_option_guards():
    """make_field rejects option combinations a form does not implement
    (r9 review): normalize/time_input are mlp-only, and normalize
    requires both scales — previously these silently no-op'd or
    crashed deep in the solver."""
    import dataclasses as dc

    import pytest

    from nlbac_tpu.config import NodeConfig
    from nlbac_tpu.nn.node import make_field

    base = NodeConfig(form="control_affine", state_dim=3, action_dim=2)
    with pytest.raises(ValueError, match="normalize"):
        make_field(dc.replace(base, normalize=True,
                              state_scale=(1., 1., 1.),
                              action_scale=(1., 1.)))
    with pytest.raises(ValueError, match="time_input"):
        make_field(dc.replace(base, time_input=True))
    with pytest.raises(ValueError, match="state_scale"):
        make_field(NodeConfig(form="mlp", state_dim=3, action_dim=2,
                              normalize=True))
