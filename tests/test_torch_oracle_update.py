"""Full-update torch-oracle parity test (unicycle).

Recomputes EVERY quantity of one NLBAC update step — twin-Q TD targets
and losses, Lyapunov TD, tanh-Gaussian log-probs, the NODE one-step
prediction, the CBF/CLF residual matrix, the ReLU-filtered batch means,
the balance ratio, the lambda ascent, rho growth, the augmented-Lagrangian
policy loss, and the entropy-temperature loss — in an INDEPENDENT torch
implementation built from the reference's equations
(UNI/sac_cbf_clf/sac_cbf_clf.py:181-530), with network weights copied from
the JAX train state and the exact same Gaussian draws injected.

If any formula, detach/stop-gradient boundary, ordering rule, or constant
in the JAX update drifts from the reference math, this test catches it at
float32 tolerance.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nlbac_tpu import replay as rlib
from nlbac_tpu.agent import create_train_state, make_agent
from nlbac_tpu.config import ReplayConfig, get_config
from nlbac_tpu.envs import unicycle as env
from nlbac_tpu.nn import gaussian_policy_forward, gaussian_policy_sample
from nlbac_tpu.agent.state import action_spec

HID = 24
NODE_HID = 12
BATCH = 6


def tiny_cfg():
    cfg = get_config("unicycle")
    return dataclasses.replace(
        cfg,
        sac=dataclasses.replace(cfg.sac, hidden_dim=HID, batch_size=BATCH),
        node=dataclasses.replace(cfg.node, hidden_dim=NODE_HID,
                                 f_hidden_layers=2, g_hidden_layers=2,
                                 max_batch=8, update_interval=1000000),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def mlp_t(params, x, final_linear=True):
    """torch forward of our MLP params ((in,out) weights)."""
    n = len(params["w"])
    for i in range(n):
        x = x @ t(params["w"][i]) + t(params["b"][i])
        if i < n - 1:
            x = torch.relu(x)
    return x


def policy_forward_t(params, obs):
    h = torch.relu(obs @ t(params["trunk"]["w"][0])
                   + t(params["trunk"]["b"][0]))
    h = torch.relu(h @ t(params["trunk"]["w"][1])
                   + t(params["trunk"]["b"][1]))
    mean = h @ t(params["mean"]["w"][0]) + t(params["mean"]["b"][0])
    log_std = h @ t(params["log_std"]["w"][0]) + t(params["log_std"]["b"][0])
    return mean, torch.clamp(log_std, -20.0, 2.0)


def policy_sample_t(params, obs, noise, scale, bias):
    """Reference GaussianPolicy.sample (model.py:116-128) with injected
    standard-normal noise."""
    mean, log_std = policy_forward_t(params, obs)
    std = log_std.exp()
    x_t = mean + std * noise
    y_t = torch.tanh(x_t)
    action = y_t * scale + bias
    # Normal log-prob + tanh correction
    log_prob = (-0.5 * noise ** 2 - log_std - 0.5 * math.log(2 * math.pi))
    log_prob = log_prob - torch.log(scale * (1 - y_t ** 2) + 1e-6)
    return action, log_prob.sum(1, keepdim=True)


def recover_noise(params, obs, key, spec):
    """Re-derive the standard-normal draw a jax sample used."""
    mean, log_std = gaussian_policy_forward(params, obs)
    a, logp, _ = gaussian_policy_sample(params, obs, key, spec)
    y = np.asarray(a) / np.asarray(spec.scale) - \
        np.asarray(spec.bias) / np.asarray(spec.scale)
    x = np.arctanh(np.clip(y, -1 + 1e-7, 1 - 1e-7))
    noise = (x - np.asarray(mean)) / np.exp(np.asarray(log_std))
    return torch.tensor(noise, dtype=torch.float64), a, logp


def node_forward_t(node_params, x, u, dt):
    """Reference NODE euler step: x + dt*(f(x) + g(x)u)
    (model.py:208-217, one euler step over [0, dt])."""
    f = mlp_t(node_params["f"], x)
    g = mlp_t(node_params["g"], x).reshape(-1, 3, 2)
    dx = f + torch.bmm(g, u.unsqueeze(-1)).squeeze(-1)
    return x + dt * dx


def test_one_update_matches_torch_oracle():
    cfg = tiny_cfg()
    ccfg, scfg = cfg.constraint, cfg.sac
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    spec = action_spec(cfg)
    agent = make_agent(cfg)

    # deterministic replay contents
    buf = rlib.create(64, 7, 2, 2)
    st, obs0 = env.reset(jax.random.PRNGKey(1))
    o = obs0
    for i in range(BATCH * 2):
        a = jnp.array([1.0 + 0.1 * i, 0.3 - 0.05 * i])
        st, out = env.step(st, a)
        rec = rlib.record_from_step(o, a, out, jnp.float32(1.0),
                                    jnp.float32(i * 0.02),
                                    jnp.float32((i + 1) * 0.02))
        buf = rlib.push(buf, rec)
        o = out.obs

    key = jax.random.PRNGKey(7)
    ts2, m = jax.jit(agent.update)(ts, buf, buf, key, jnp.int32(0))

    # ---- reconstruct the exact batch and noise the update used --------
    keys = jax.random.split(key, 3)
    batch = rlib.sample(buf, keys[0], BATCH)
    inner = jax.random.split(keys[2], 8)
    n_next, a_next, logp_next = recover_noise(ts.policy,
                                              batch["next_obs"], inner[2],
                                              spec)
    n_pi, a_pi, _ = recover_noise(ts.policy, batch["obs"], inner[3], spec)

    scale, bias = t(spec.scale), t(spec.bias)
    obs = t(batch["obs"])
    next_obs = t(batch["next_obs"])
    action = t(batch["action"])
    reward = t(batch["reward"]).unsqueeze(1)
    constraint = t(batch["constraint"]).unsqueeze(1)
    mask = t(batch["mask"]).unsqueeze(1)
    lyap_t_in = t(batch["lyap_t"])

    # ---- critic TD (sac_cbf_clf.py:231-246) ----------------------------
    # The reference's stale-alpha quirk: update 1 consumes
    # self.alpha = args.alpha (sac_cbf_clf.py:32, only overwritten by
    # exp(log_alpha) at the END of each update) — this oracle models the
    # first update, so the temperature is alpha_init, NOT exp(0)=1.
    alpha = scfg.alpha_init
    na, nlogp = policy_sample_t(ts.policy, next_obs, n_next, scale, bias)
    q1_t = mlp_t(ts.critic["q1"], torch.cat([next_obs, na], 1))
    q2_t = mlp_t(ts.critic["q2"], torch.cat([next_obs, na], 1))
    min_q = torch.minimum(q1_t, q2_t) - alpha * nlogp
    next_q = reward + mask * scfg.gamma * min_q

    q1 = mlp_t(ts.critic["q1"], torch.cat([obs, action], 1))
    q2 = mlp_t(ts.critic["q2"], torch.cat([obs, action], 1))
    qf1_loss = ((q1 - next_q) ** 2).mean()
    qf2_loss = ((q2 - next_q) ** 2).mean()

    np.testing.assert_allclose(float(m["qf1_loss"]), float(qf1_loss),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m["qf2_loss"]), float(qf2_loss),
                               rtol=2e-4)

    # ---- Lyapunov TD ----------------------------------------------------
    lf_t1 = mlp_t(ts.lyap, t(batch["lyap_t1"]))
    next_l = constraint + mask * scfg.gamma * lf_t1
    lf = mlp_t(ts.lyap, lyap_t_in)
    lf_loss = ((lf - next_l) ** 2).mean()
    np.testing.assert_allclose(float(m["lf_loss"]), float(lf_loss),
                               rtol=2e-4)

    # ---- policy loss 1 with the POST-ADAM critic -----------------------
    # The framework steps the critic before the policy loss; replicate the
    # Adam(4e-4) first step exactly: m_hat/(sqrt(v_hat)+eps) with grads
    # from qf_loss. Doing full torch autograd Adam here is equivalent to
    # checking optax; instead pull the updated critic from the jax result
    # (its own correctness is covered by the TD-loss checks above).
    critic_new = jax.tree.map(lambda x: x, ts2.critic)
    q1p = mlp_t(critic_new["q1"], torch.cat([obs, t(a_pi)], 1))
    q2p = mlp_t(critic_new["q2"], torch.cat([obs, t(a_pi)], 1))
    # log-prob of the injected draw under the OLD policy
    _, logp_pi = policy_sample_t(ts.policy, obs, n_pi, scale, bias)
    policy_loss_1 = (alpha * logp_pi - torch.minimum(q1p, q2p)).mean()
    np.testing.assert_allclose(float(m["policy_loss"]),
                               float(policy_loss_1), rtol=3e-4, atol=3e-4)

    # ---- constraint part: residuals, ratio, lambda, rho, loss2 ---------
    # (sac_cbf_clf.py:408-530, with the POST-step lyap net as the
    # framework uses — pull it from ts2, its TD step is verified above)
    lyap_new = ts2.lyap
    dt = cfg.env.dt
    state = torch.stack([obs[:, 0], obs[:, 1],
                         torch.atan2(obs[:, 3], obs[:, 2])], 1)
    lp = ccfg.lookahead
    ps = torch.stack([state[:, 0] + lp * torch.cos(state[:, 2]),
                      state[:, 1] + lp * torch.sin(state[:, 2])], 1)
    pred = node_forward_t(ts2.node, state, t(a_pi), dt)
    ps_next = torch.stack([pred[:, 0] + lp * torch.cos(pred[:, 2]),
                           pred[:, 1] + lp * torch.sin(pred[:, 2])], 1)

    l_t = mlp_t(lyap_new, lyap_t_in)  # detached in the loss
    l_t1 = mlp_t(lyap_new, ps_next)
    gamma_l = 1.0
    clf = (l_t1 - l_t) / dt + gamma_l * l_t

    hz = t(np.asarray(env.HAZARDS))
    cr = 1.05 * 0.5
    hs = 0.5 * (((ps.unsqueeze(1) - hz.unsqueeze(0)) ** 2).sum(2) - cr ** 2)
    hs_n = 0.5 * (((ps_next.unsqueeze(1) - hz.unsqueeze(0)) ** 2).sum(2)
                  - cr ** 2)
    cbf = -((hs_n - hs) / dt) - ccfg.gamma_b * hs

    matr = torch.cat([cbf, clf], 1)
    c = torch.clamp(matr, min=0).sum(0) / BATCH  # relu-filtered batch mean
    ratio = float(abs(c[:-1].mean()) / max(abs(c[-1]), 1e-12))
    lam = torch.clamp(0.0 + 1.0 * c, 0.01, ccfg.lambda_max)  # ascent @u0
    rho = min(1.0 * ccfg.rho_growth, ccfg.rho_max)
    loss2 = float(sum(lam[i] * c[i] + rho / 2 * c[i] ** 2
                      for i in range(7))
                  + lam[7] * ratio * c[7]
                  + ratio ** 2 * rho / 2 * c[7] ** 2)

    np.testing.assert_allclose(np.asarray(ts2.lag.lam),
                               lam.numpy(), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(float(m["constraint_loss"]), loss2,
                               rtol=3e-3, atol=3e-3)
    # rho after the backup's second bump (shared-rho double increment)
    np.testing.assert_allclose(float(m["rho"]),
                               min(rho * ccfg.rho_growth, ccfg.rho_max),
                               rtol=1e-6)

    # ---- entropy temperature loss --------------------------------------
    alpha_loss = -(0.0 * (float(logp_pi.mean()) - 2.0))  # log_alpha=0
    # reference: -(log_alpha * (logp + target_entropy).detach()).mean()
    np.testing.assert_allclose(float(m["alpha_loss"]), alpha_loss,
                               atol=1e-6)


def mlp_t_generic(params, x):
    return mlp_t(params, x)


def test_cars_constraint_chain_matches_torch_oracle():
    """The 2-step rel-degree-2 HOCBF chain (CARS/sac_cbf_clf/sac_cbf_clf.py
    :412-576): NODE(x,u,t) -> resample u1 at the predicted obs ->
    NODE(x1,u1,t+dt) -> gap HOCBFs + CLF on [x3,v3,x4,v4], ratio floored
    at 0.002, lambda clamped to 300."""
    from nlbac_tpu.envs import cars as ecars
    from nlbac_tpu.nn import predict_next_state

    cfg = get_config("cars")
    cfg = dataclasses.replace(
        cfg,
        sac=dataclasses.replace(cfg.sac, hidden_dim=HID, batch_size=BATCH),
        node=dataclasses.replace(cfg.node, hidden_dim=NODE_HID,
                                 mlp_hidden_layers=2, max_batch=8,
                                 update_interval=1000000),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    ccfg = cfg.constraint
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    spec = action_spec(cfg)
    agent = make_agent(cfg)

    buf = rlib.create(64, 10, 1, 4)
    st, o = ecars.reset(jax.random.PRNGKey(1))
    for i in range(BATCH * 2):
        a = jnp.array([0.5 - 0.1 * i])
        st, out = ecars.step(st, a)
        rec = rlib.record_from_step(o, a, out, jnp.float32(1.0),
                                    jnp.float32(i * 0.02),
                                    jnp.float32((i + 1) * 0.02))
        buf = rlib.push(buf, rec)
        o = out.obs

    key = jax.random.PRNGKey(9)
    ts2, m = jax.jit(agent.update)(ts, buf, buf, key, jnp.int32(0))

    # reconstruct batch + inner keys
    keys = jax.random.split(key, 3)
    batch = rlib.sample(buf, keys[0], BATCH)
    inner = jax.random.split(keys[2], 8)
    n_pi, a_pi, _ = recover_noise(ts.policy, batch["obs"], inner[3], spec)

    # the resample happens at the predicted detached obs; reproduce the
    # prediction with jax (verified equal to torch below), then recover
    # the u1 noise from the same key the update used (keys[4])
    x0_j = ecars.obs_to_state(batch["obs"])
    x1_j = predict_next_state(cfg.node, ts.node, x0_j, a_pi, 0.02,
                              t=batch["t"][:, None])
    obs1_j = ecars.state_to_obs(x1_j)
    n_u1, u1_j, _ = recover_noise(ts.policy, obs1_j, inner[4], spec)

    scale, bias = t(spec.scale), t(spec.bias)
    dt = 0.02
    x0 = t(x0_j)
    t_b = t(batch["t"]).unsqueeze(1)

    def node_step_t(x, u, tt):
        s = torch.cat([x, u, tt], 1)
        dx = mlp_t(ts.node["net"], s)
        return x + dt * dx

    x1 = node_step_t(x0, t(a_pi), t_b)
    np.testing.assert_allclose(np.asarray(x1_j), x1.numpy(), rtol=2e-4,
                               atol=2e-4)
    obs1 = x1 / t(np.tile([100.0, 30.0], 5))
    u1, _ = policy_sample_t(ts.policy, obs1, n_u1, scale, bias)
    np.testing.assert_allclose(np.asarray(u1_j), u1.numpy(), rtol=2e-3,
                               atol=2e-3)
    x2 = node_step_t(x1, u1, t(batch["next_t"]).unsqueeze(1))

    def gaps(x):
        return (x[:, 4] - x[:, 6] - 4.5).unsqueeze(1), \
               (x[:, 6] - x[:, 8] - 4.5).unsqueeze(1)

    gb = ccfg.gamma_b
    h23_0, h34_0 = gaps(x0)
    h23_1, h34_1 = gaps(x1)
    h23_2, h34_2 = gaps(x2)

    def hocbf(h0, h1, h2):
        l1 = h1 - h0 + gb * h0
        l2 = h2 - h1 + gb * h1
        return -(l2 - l1) - gb * l1

    lyap_new = ts2.lyap
    l_t = mlp_t(lyap_new, t(batch["lyap_t"]))
    l_t1 = mlp_t(lyap_new, x1[:, 4:8])
    clf = (l_t1 - l_t) + ccfg.gamma_l * l_t  # NOT dt-scaled for cars

    matr = torch.cat([hocbf(h23_0, h23_1, h23_2),
                      hocbf(h34_0, h34_1, h34_2), clf], 1)
    c = torch.clamp(matr, min=0).sum(0) / BATCH
    ratio = float(abs(c[:-1].mean()) / max(abs(c[-1]), 1e-12))
    ratio = max(ratio, 0.002)
    lam = torch.clamp(0.0 + 1.0 * c, 0.01, 300.0)
    rho = min(1.0 * ccfg.rho_growth, ccfg.rho_max)
    loss2 = float(sum(lam[i] * c[i] + rho / 2 * c[i] ** 2
                      for i in range(2))
                  + lam[2] * ratio * c[2] + ratio ** 2 * rho / 2 * c[2] ** 2)

    np.testing.assert_allclose(np.asarray(ts2.lag.lam), lam.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(m["constraint_loss"]), loss2,
                               rtol=5e-3, atol=5e-3)


def test_nbc_barrier_constraint_and_td_match_torch_oracle():
    """Learned-barrier family (NBC-UNI/sac_cbf_clf/sac_cbf_clf.py:200-482):
    barrier TD on barrier signals, and the constraint pair
    [-(B1 - B0_detached) - gamma_b*B0_detached, CLF] with NO ratio."""
    from nlbac_tpu.nn import predict_next_state

    cfg = get_config("nbc_unicycle")
    cfg = dataclasses.replace(
        cfg,
        sac=dataclasses.replace(cfg.sac, hidden_dim=HID, batch_size=BATCH),
        node=dataclasses.replace(cfg.node, hidden_dim=NODE_HID,
                                 f_hidden_layers=2, g_hidden_layers=2,
                                 max_batch=8, update_interval=1000000),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    ccfg, scfg = cfg.constraint, cfg.sac
    assert not ccfg.use_ratio and not ccfg.use_backup
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    spec = action_spec(cfg)
    agent = make_agent(cfg)

    buf = rlib.create(64, 7, 2, 2)
    st, o = env.reset(jax.random.PRNGKey(1))
    for i in range(BATCH * 2):
        a = jnp.array([2.0, 0.5 - 0.1 * i])
        st, out = env.step(st, a, barrier_B=cfg.env.barrier_B)
        rec = rlib.record_from_step(o, a, out, jnp.float32(1.0),
                                    jnp.float32(i * 0.02),
                                    jnp.float32((i + 1) * 0.02))
        buf = rlib.push(buf, rec)
        o = out.obs

    key = jax.random.PRNGKey(11)
    ts2, m = jax.jit(agent.update)(ts, buf, buf, key, jnp.int32(0))

    keys = jax.random.split(key, 3)
    batch = rlib.sample(buf, keys[0], BATCH)
    inner = jax.random.split(keys[2], 8)
    n_next, a_next, _ = recover_noise(ts.policy, batch["next_obs"],
                                      inner[2], spec)
    n_pi, a_pi, _ = recover_noise(ts.policy, batch["obs"], inner[3], spec)

    scale, bias = t(spec.scale), t(spec.bias)
    obs = t(batch["obs"])
    next_obs = t(batch["next_obs"])
    mask = t(batch["mask"]).unsqueeze(1)

    # ---- barrier TD ----------------------------------------------------
    na, _ = policy_sample_t(ts.policy, next_obs, n_next, scale, bias)
    b_next_t = mlp_t(ts.barrier_target, torch.cat([next_obs, na], 1))
    next_b = t(batch["barrier_signal"]).unsqueeze(1) \
        + mask * scfg.gamma * b_next_t
    b = mlp_t(ts.barrier, torch.cat([obs, t(batch["action"])], 1))
    barrier_td = ((b - next_b) ** 2).mean()
    np.testing.assert_allclose(float(m["barrier_td_loss"]),
                               float(barrier_td), rtol=3e-4, atol=1e-6)

    # ---- barrier + CLF constraint pair ----------------------------------
    dt = cfg.env.dt
    x0_j = env.obs_to_state(batch["obs"])
    x1_j = predict_next_state(cfg.node, ts.node, x0_j, a_pi, dt)
    obs1_j = env.state_to_obs(x1_j)
    n_u1, u1_j, _ = recover_noise(ts.policy, obs1_j, inner[4], spec)

    x0 = t(x0_j)
    x1 = node_forward_t(ts.node, x0, t(a_pi), dt)
    np.testing.assert_allclose(np.asarray(x1_j), x1.numpy(), rtol=2e-4,
                               atol=2e-4)
    # torch reconstruction of the 7-d obs at the prediction
    th = x1[:, 2]
    rel = t(np.array([2.5, 2.5])) - x1[:, :2]
    vec = torch.stack([rel[:, 0] * torch.cos(th) + rel[:, 1] * torch.sin(th),
                       -rel[:, 0] * torch.sin(th)
                       + rel[:, 1] * torch.cos(th)], 1)
    vec = vec / (vec.norm(dim=1, keepdim=True) + 0.001)
    obs1 = torch.cat([x1[:, :2], torch.cos(th).unsqueeze(1),
                      torch.sin(th).unsqueeze(1), vec,
                      torch.exp(-rel.norm(dim=1, keepdim=True))], 1)
    u1, _ = policy_sample_t(ts.policy, obs1, n_u1, scale, bias)

    barrier_new = ts2.barrier  # barrier TD step happens BEFORE policy loss
    b0 = mlp_t(barrier_new, torch.cat([obs, t(a_pi)], 1))
    b1 = mlp_t(barrier_new, torch.cat([obs1, u1], 1))
    barrier_term = -(b1 - b0) - ccfg.gamma_b * b0

    lyap_new = ts2.lyap
    lp = ccfg.lookahead
    ps_next = torch.stack([x1[:, 0] + lp * torch.cos(th),
                           x1[:, 1] + lp * torch.sin(th)], 1)
    l_t = mlp_t(lyap_new, t(batch["lyap_t"]))
    l_t1 = mlp_t(lyap_new, ps_next)
    clf = (l_t1 - l_t) / dt + ccfg.gamma_l * l_t

    matr = torch.cat([barrier_term, clf], 1)
    c = torch.clamp(matr, min=0).sum(0) / BATCH
    lam = torch.clamp(0.0 + 1.0 * c, 0.01, ccfg.lambda_max)
    rho = min(1.0 * ccfg.rho_growth, ccfg.rho_max)
    loss2 = float(sum(lam[i] * c[i] + rho / 2 * c[i] ** 2
                      for i in range(2)))  # NO ratio for NBC-UNI
    np.testing.assert_allclose(np.asarray(ts2.lag.lam), lam.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(m["constraint_loss"]), loss2,
                               rtol=5e-3, atol=5e-3)
    # NBC: single rho bump (no backup loss)
    np.testing.assert_allclose(float(m["rho"]), rho, rtol=1e-6)


def test_pvtol_constraint_chain_matches_torch_oracle():
    """The 3-step rel-degree-3 chain (PVTOL/sac_cbf_clf/sac_cbf_clf.py:
    424-738): NODE over the 6-d dynamics state, analytic operator
    propagation at every horizon, two detached policy resamples at
    reconstructed 11-d observations, 9 HOCBFs + obs-space CLF, floored
    ratio, separate backup rho (primary loss only bumps the shared rho
    once)."""
    from nlbac_tpu.envs import pvtol as epv
    from nlbac_tpu.nn import predict_next_state

    cfg = get_config("pvtol")
    cfg = dataclasses.replace(
        cfg,
        sac=dataclasses.replace(cfg.sac, hidden_dim=HID, batch_size=BATCH),
        node=dataclasses.replace(cfg.node, hidden_dim=NODE_HID,
                                 f_hidden_layers=2, g_hidden_layers=2,
                                 max_batch=8, update_interval=1000000),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    ccfg = cfg.constraint
    assert ccfg.separate_backup_rho
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    spec = action_spec(cfg)
    agent = make_agent(cfg)

    buf = rlib.create(64, 11, 2, 11)
    st, o = epv.reset(jax.random.PRNGKey(1))
    for i in range(BATCH * 2):
        a = jnp.array([0.3, 1.0 - 0.2 * i])
        st, out = epv.step(st, a)
        rec = rlib.record_from_step(o, a, out, jnp.float32(1.0),
                                    jnp.float32(i * 0.02),
                                    jnp.float32((i + 1) * 0.02))
        buf = rlib.push(buf, rec)
        o = out.obs

    key = jax.random.PRNGKey(13)
    ts2, m = jax.jit(agent.update)(ts, buf, buf, key, jnp.int32(0))

    keys = jax.random.split(key, 3)
    batch = rlib.sample(buf, keys[0], BATCH)
    inner = jax.random.split(keys[2], 8)
    n_pi, a_pi, _ = recover_noise(ts.policy, batch["obs"], inner[3], spec)

    scale, bias = t(spec.scale), t(spec.bias)
    dt = cfg.env.dt

    def node_step_t(x6, u):
        f = mlp_t(ts.node["f"], x6)
        g = mlp_t(ts.node["g"], x6).reshape(-1, 6, 2)
        return x6 + dt * (f + torch.bmm(g, u.unsqueeze(-1)).squeeze(-1))

    def obs_from_state_t(s7):
        th = s7[:, 2]
        rel = t(np.array([4.5, 4.5])) - s7[:, :2]
        vec = torch.stack(
            [rel[:, 0] * torch.cos(th) + rel[:, 1] * torch.sin(th),
             -rel[:, 0] * torch.sin(th) + rel[:, 1] * torch.cos(th)], 1)
        vec = vec / (vec.norm(dim=1, keepdim=True) + 0.001)
        return torch.cat([s7[:, :2], torch.cos(th).unsqueeze(1),
                          torch.sin(th).unsqueeze(1), s7[:, 3:7], vec,
                          torch.exp(-rel.norm(dim=1, keepdim=True))], 1)

    # jax-side prediction chain reproduction (to recover resample noise)
    s7_j = epv.obs_to_state(batch["obs"])
    d1_j = predict_next_state(cfg.node, ts.node, s7_j[:, :6], a_pi, dt)
    op1_j = epv.propagate_operator(s7_j[:, 6], d1_j[:, 0])
    s1_j = jnp.concatenate([d1_j, op1_j[:, None]], axis=1)
    obs1_j = epv.state_to_obs(s1_j)
    # _chain splits keys[4] into `horizon` keys and uses them in order
    chain_keys = jax.random.split(inner[4], ccfg.horizon)
    n_u1, u1_j, _ = recover_noise(ts.policy, obs1_j, chain_keys[0], spec)
    d2_j = predict_next_state(cfg.node, ts.node, d1_j, u1_j, dt)
    op2_j = epv.propagate_operator(op1_j, d2_j[:, 0])
    s2_j = jnp.concatenate([d2_j, op2_j[:, None]], axis=1)
    obs2_j = epv.state_to_obs(s2_j)
    n_u2, u2_j, _ = recover_noise(ts.policy, obs2_j, chain_keys[1], spec)

    # torch chain
    s7 = t(s7_j)
    d1 = node_step_t(s7[:, :6], t(a_pi))
    op1 = s7[:, 6] + 0.7 * (d1[:, 0] - s7[:, 6])
    s1 = torch.cat([d1, op1.unsqueeze(1)], 1)
    u1, _ = policy_sample_t(ts.policy, obs_from_state_t(s1), n_u1, scale,
                            bias)
    d2 = node_step_t(d1, u1)
    op2 = op1 + 0.7 * (d2[:, 0] - op1)
    s2 = torch.cat([d2, op2.unsqueeze(1)], 1)
    u2, _ = policy_sample_t(ts.policy, obs_from_state_t(s2), n_u2, scale,
                            bias)
    d3 = node_step_t(d2, u2)
    op3 = op2 + 0.7 * (d3[:, 0] - op2)
    s3 = torch.cat([d3, op3.unsqueeze(1)], 1)

    hz = t(np.asarray(epv.HAZARDS))
    cr = ccfg.collision_buffer * 0.25
    od = ccfg.operator_margin * 1.0
    dy = ccfg.box_delta_y

    def fams(s):
        pos = s[:, :2]
        h_obs = 0.5 * (((pos.unsqueeze(1) - hz.unsqueeze(0)) ** 2).sum(2)
                       - cr ** 2)
        h1 = (s[:, 0] - s[:, 6] + od).unsqueeze(1)
        h2 = (s[:, 6] - s[:, 0] + od).unsqueeze(1)
        h3 = (-s[:, 1] + 100.0 - dy).unsqueeze(1)
        h4 = (s[:, 1] + 100.0 - dy).unsqueeze(1)
        return torch.cat([h_obs, h1, h2, h3, h4], 1)

    gb = ccfg.gamma_b
    H = [fams(s) for s in (s7, s1, s2, s3)]
    term1 = H[3] - H[2] + gb * H[2]
    term2 = H[2] - H[1] + gb * H[1]
    term3 = H[1] - H[0] + gb * H[0]
    inner_t = term2 - term3 + gb * term3
    cbf = -(term1 - term2 + gb * term2 - inner_t + gb * inner_t)

    lyap_new = ts2.lyap
    l_t = mlp_t(lyap_new, t(batch["lyap_t"]))
    l_t1 = mlp_t(lyap_new, obs_from_state_t(s1))
    clf = (l_t1 - l_t) + ccfg.gamma_l * l_t  # not dt-scaled

    matr = torch.cat([cbf, clf], 1)
    c = torch.clamp(matr, min=0).sum(0) / BATCH
    ratio = max(float(abs(c[:-1].mean()) / max(abs(c[-1]), 1e-12)), 0.002)
    lam = torch.clamp(0.0 + 1.0 * c, 0.01, ccfg.lambda_max)
    rho = min(1.0 * ccfg.rho_growth, ccfg.rho_max)
    loss2 = float(sum(lam[i] * c[i] + rho / 2 * c[i] ** 2
                      for i in range(9))
                  + lam[9] * ratio * c[9] + ratio ** 2 * rho / 2 * c[9] ** 2)

    np.testing.assert_allclose(np.asarray(ts2.lag.lam), lam.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(m["constraint_loss"]), loss2,
                               rtol=1e-2, atol=1e-2)
    # separate backup rho: primary rho bumps once; backup rho bumped once
    # by the gated (updates=0) backup branch
    np.testing.assert_allclose(float(m["rho"]), rho, rtol=1e-6)
    np.testing.assert_allclose(float(ts2.lag.backup_rho), rho, rtol=1e-6)


def test_optax_adam_matches_torch_adam():
    """The reference uses torch.optim.Adam everywhere; optax.adam must
    produce the same parameter updates (same m-hat/(sqrt(v-hat)+eps)
    bias-corrected form) over several steps."""
    import optax
    w0 = np.linspace(-1, 1, 12).reshape(3, 4).astype(np.float32)
    grads = [np.sin(np.arange(12, dtype=np.float32) + i).reshape(3, 4)
             for i in range(5)]
    lr = 3e-4

    opt = optax.adam(lr)
    pj = jnp.array(w0)
    state = opt.init(pj)
    for g in grads:
        upd, state = opt.update(jnp.array(g), state, pj)
        pj = optax.apply_updates(pj, upd)

    pt = torch.nn.Parameter(torch.tensor(w0, dtype=torch.float32))
    topt = torch.optim.Adam([pt], lr=lr)
    for g in grads:
        topt.zero_grad()
        pt.grad = torch.tensor(g)
        topt.step()

    np.testing.assert_allclose(np.asarray(pj), pt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
