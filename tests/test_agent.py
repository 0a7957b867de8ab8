"""Agent-level semantic tests: update cadences, Lagrangian state
transitions, variant gating (PVTOL backup interval, NBC barrier TD),
entropy temperature direction."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlbac_tpu import replay as rlib
from nlbac_tpu.agent import create_train_state, make_agent
from nlbac_tpu.config import ReplayConfig, get_config
from nlbac_tpu.envs import get_env


def tiny(preset, **constraint_over):
    cfg = get_config(preset)
    return dataclasses.replace(
        cfg,
        sac=dataclasses.replace(cfg.sac, hidden_dim=16, batch_size=8,
                                start_steps=5),
        node=dataclasses.replace(cfg.node, hidden_dim=8, f_hidden_layers=1,
                                 g_hidden_layers=1, mlp_hidden_layers=1,
                                 max_batch=16, update_interval=3),
        constraint=dataclasses.replace(cfg.constraint, **constraint_over),
        replay=ReplayConfig(capacity=128, node_capacity=128),
    )


def fill_replay(cfg, n=30, seed=1):
    env = get_env(cfg.env.name)
    spec = env.SPEC
    buf = rlib.create(128, spec.obs_dim, spec.action_dim, spec.lyap_dim)
    key = jax.random.PRNGKey(seed)
    st, obs = env.reset(key)
    for i in range(n):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (spec.action_dim,),
                               minval=jnp.array(spec.action_low),
                               maxval=jnp.array(spec.action_high))
        st, out = env.step(st, a, barrier_B=cfg.env.barrier_B
                           if cfg.env.barrier_signals else 0.0)
        rec = rlib.record_from_step(obs, a, out, jnp.float32(1.0),
                                    jnp.float32(i * cfg.env.dt),
                                    jnp.float32((i + 1) * cfg.env.dt))
        buf = rlib.push(buf, rec)
        obs = out.obs
    return buf


def run_updates(cfg, n_updates, seed=0):
    ts = create_train_state(cfg, jax.random.PRNGKey(seed))
    buf = fill_replay(cfg)
    agent = make_agent(cfg)
    upd = jax.jit(agent.update)
    snapshots = [ts]
    for u in range(n_updates):
        ts, m = upd(ts, buf, buf, jax.random.PRNGKey(100 + u),
                    jnp.int32(0))
        snapshots.append(ts)
    return snapshots, m


def _changed(a, b):
    return any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_update_counter_and_rho_double_bump():
    """UNI shares one rho between primary and backup losses: each update
    multiplies it by growth^2 (SURVEY.md §2.2 'rho double-increment')."""
    cfg = tiny("unicycle")
    snaps, _ = run_updates(cfg, 3)
    assert int(snaps[-1].updates) == 3
    g = cfg.constraint.rho_growth
    for i in range(3):
        np.testing.assert_allclose(float(snaps[i + 1].lag.rho),
                                   float(snaps[i].lag.rho) * g * g,
                                   rtol=1e-5)


def test_nbc_no_backup_single_rho_bump():
    cfg = tiny("nbc_unicycle")
    assert not cfg.constraint.use_backup
    snaps, m = run_updates(cfg, 2)
    g = cfg.constraint.rho_growth
    np.testing.assert_allclose(float(snaps[1].lag.rho),
                               float(snaps[0].lag.rho) * g, rtol=1e-5)
    # backup nets untouched, barrier net trained
    assert not _changed(snaps[0].backup_policy, snaps[-1].backup_policy)
    assert _changed(snaps[0].barrier, snaps[-1].barrier)
    assert float(m["barrier_td_loss"]) > 0.0


def test_pvtol_backup_interval_gating():
    """PVTOL updates the backup controller every 20 updates and keeps a
    separate backup rho."""
    cfg = tiny("pvtol")
    assert cfg.constraint.backup_update_interval == 20
    assert cfg.constraint.separate_backup_rho
    snaps, _ = run_updates(cfg, 3)
    # update 0 hits the gate (0 % 20 == 0): backup changed once
    assert _changed(snaps[0].backup_policy, snaps[1].backup_policy)
    # updates 1, 2 don't hit the gate: backup frozen
    assert not _changed(snaps[1].backup_policy, snaps[2].backup_policy)
    assert not _changed(snaps[2].backup_policy, snaps[3].backup_policy)
    # primary rho bumps every update; backup rho only on the gated one
    g = cfg.constraint.rho_growth
    np.testing.assert_allclose(float(snaps[3].lag.rho),
                               float(snaps[0].lag.rho) * g ** 3, rtol=1e-5)
    np.testing.assert_allclose(float(snaps[3].lag.backup_rho),
                               float(snaps[0].lag.backup_rho) * g,
                               rtol=1e-5)


def test_lambda_ascent_interval():
    cfg = tiny("unicycle",
               lambda_update_interval=2)
    snaps, _ = run_updates(cfg, 3)
    lam = [np.asarray(s.lag.lam) for s in snaps]
    # updates 0 and 2 hit the gate; update 1 doesn't
    assert not np.array_equal(lam[0], lam[1])
    np.testing.assert_array_equal(lam[1], lam[2])
    assert not np.array_equal(lam[2], lam[3])
    assert np.all(lam[-1] >= 0.01 - 1e-7)


def test_lagrangian_warmup_freezes_schedule():
    """Lever 10 (ConstraintConfig.lagrangian_warmup_episodes): multiplier
    ascent AND rho growth are frozen while i_episode < N, and the
    reference schedule (UNI's shared-rho double bump) resumes exactly at
    episode N; the policy itself still trains during the warmup."""
    cfg = tiny("unicycle", lagrangian_warmup_episodes=3,
               lambda_update_interval=1)
    ts0 = create_train_state(cfg, jax.random.PRNGKey(0))
    buf = fill_replay(cfg)
    upd = jax.jit(make_agent(cfg).update)
    g = cfg.constraint.rho_growth

    ts1, _ = upd(ts0, buf, buf, jax.random.PRNGKey(1), jnp.int32(2))
    np.testing.assert_array_equal(np.asarray(ts1.lag.rho),
                                  np.asarray(ts0.lag.rho))
    np.testing.assert_array_equal(np.asarray(ts1.lag.lam),
                                  np.asarray(ts0.lag.lam))
    np.testing.assert_array_equal(np.asarray(ts1.lag.backup_lam),
                                  np.asarray(ts0.lag.backup_lam))
    assert _changed(ts0.policy, ts1.policy)

    ts2, _ = upd(ts1, buf, buf, jax.random.PRNGKey(2), jnp.int32(3))
    np.testing.assert_allclose(float(ts2.lag.rho),
                               float(ts1.lag.rho) * g * g, rtol=1e-5)
    assert not np.array_equal(np.asarray(ts2.lag.lam),
                              np.asarray(ts1.lag.lam))


def test_all_networks_train_and_targets_move():
    cfg = tiny("unicycle")
    snaps, m = run_updates(cfg, 2)
    a, b = snaps[0], snaps[-1]
    for name in ("policy", "backup_policy", "critic", "lyap", "node"):
        assert _changed(getattr(a, name), getattr(b, name)), name
    # soft targets move by tau-weighted amounts (tau=0.005 -> small)
    assert _changed(a.critic_target, b.critic_target)
    ta = jax.tree.leaves(a.critic_target)[0]
    tb = jax.tree.leaves(b.critic_target)[0]
    assert float(jnp.max(jnp.abs(ta - tb))) < 0.1


def test_alpha_moves_toward_target_entropy():
    cfg = tiny("unicycle")
    snaps, m = run_updates(cfg, 4)
    alphas = [float(jnp.exp(s.log_alpha[0])) for s in snaps]
    assert alphas[0] == pytest.approx(1.0)
    assert alphas[-1] != alphas[0]
    assert np.isfinite(float(m["alpha_loss"]))


def test_select_action_modes():
    cfg = tiny("unicycle")
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    agent = make_agent(cfg)
    env = get_env("unicycle")
    _, obs = env.reset(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    sel = jax.jit(agent.select_action)
    a_pri = sel(ts, obs, key, jnp.array(False), jnp.array(False))
    a_bak = sel(ts, obs, key, jnp.array(False), jnp.array(True))
    a_rnd = sel(ts, obs, key, jnp.array(True), jnp.array(False))
    assert a_pri.shape == (2,)
    assert not np.allclose(np.asarray(a_pri), np.asarray(a_bak))
    low = np.array(env.SPEC.action_low)
    high = np.array(env.SPEC.action_high)
    for a in (a_pri, a_bak, a_rnd):
        assert np.all(np.asarray(a) >= low - 1e-5)
        assert np.all(np.asarray(a) <= high + 1e-5)


def test_select_action_nbc_skips_dead_backup_sample():
    """NBC variants have no backup controller (SURVEY §2.2): select_action
    must return exactly the primary-policy sample (the backup MLP apply is
    elided), with the RNG stream unchanged (k1 of the same 3-way split)."""
    from nlbac_tpu.nn import ActionSpec, gaussian_policy_sample

    cfg = tiny("nbc_unicycle")
    assert not cfg.constraint.use_backup
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    agent = make_agent(cfg)
    env = get_env("unicycle")
    _, obs = env.reset(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    a = jax.jit(agent.select_action)(ts, obs, key, jnp.array(False),
                                     jnp.array(False))
    spec = ActionSpec.from_bounds(jnp.array(env.SPEC.action_low),
                                  jnp.array(env.SPEC.action_high))
    k1 = jax.random.split(key, 3)[0]
    expect, _, _ = gaussian_policy_sample(ts.policy, obs[None, :], k1, spec)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(expect[0]))

    # and the kind='none' supervisor hands the driver a LITERAL False
    from nlbac_tpu.train.supervisor import init_supervisor, pre_action
    flag, _ = pre_action(cfg.supervisor, init_supervisor(cfg.supervisor),
                         jnp.array(True))
    assert bool(flag) is False


def test_node_fit_gating_interval():
    cfg = tiny("unicycle")  # update_interval=3
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    buf = fill_replay(cfg)
    agent = make_agent(cfg)
    upd = jax.jit(agent.update)
    losses = []
    for u in range(4):
        ts, m = upd(ts, buf, buf, jax.random.PRNGKey(u), jnp.int32(0))
        losses.append(float(m["node_loss"]))
    # fits at updates 0 and 3 only
    assert losses[0] > 0 and losses[3] > 0
    assert losses[1] == 0 and losses[2] == 0


def test_deterministic_policy_mode():
    """The reference's --policy Deterministic branch: clipped-noise
    deterministic head, alpha forced to 0, no entropy tuning (and unlike
    the reference, the backup controller still works)."""
    cfg = tiny("unicycle")
    cfg = dataclasses.replace(
        cfg, sac=dataclasses.replace(cfg.sac, policy_type="deterministic"))
    snaps, m = run_updates(cfg, 2)
    assert float(m["alpha"]) == 0.0
    assert float(m["alpha_loss"]) == 0.0
    # log_alpha untouched in deterministic mode
    np.testing.assert_array_equal(np.asarray(snaps[0].log_alpha),
                                  np.asarray(snaps[-1].log_alpha))
    assert _changed(snaps[0].policy, snaps[-1].policy)
    # actions respect bounds with the clipped-noise head
    agent = make_agent(cfg)
    env = get_env("unicycle")
    _, obs = env.reset(jax.random.PRNGKey(0))
    a = agent.select_action(snaps[-1], obs, jax.random.PRNGKey(1),
                            jnp.array(False), jnp.array(False))
    low = np.array(env.SPEC.action_low) - 0.26  # noise clip margin
    high = np.array(env.SPEC.action_high) + 0.26
    assert np.all(np.asarray(a) >= low) and np.all(np.asarray(a) <= high)


def test_node_fit_samples_whole_buffer():
    """Regression: NODE fits must sample the WHOLE buffer, not the oldest
    max_batch records.

    The reference bounds the NODE batch SIZE at min(position, 32768) but
    draws the sample from the entire buffer (UNI/sac_cbf_clf/
    sac_cbf_clf.py:205-208, replay_memory.py:23).  A max_index bound on
    the sample would permanently freeze dynamics training on the oldest
    (warmup) data once the buffer passes max_batch pushes.

    Setup: the first max_batch records are identity transitions
    (next_obs == obs, NODE MSE ~ dt^2 * ||F||^2, tiny for fresh params);
    every later record has a huge state jump.  If sampling covered only
    the oldest max_batch records the fit loss would be ~1e-3; sampling
    the whole buffer makes it O(jump^2)."""
    cfg = tiny("unicycle")  # node.max_batch == 16
    env = get_env("unicycle")
    spec = env.SPEC
    buf = rlib.create(128, spec.obs_dim, spec.action_dim, spec.lyap_dim)
    x0 = jnp.array([0.5, -0.5, 0.3])
    obs0 = env.state_to_obs(x0[None, :])[0]
    obs_jump = env.state_to_obs((x0 + jnp.array([10.0, 10.0, 0.0]))
                                [None, :])[0]
    a = jnp.zeros((spec.action_dim,))
    z = jnp.float32(0.0)

    def rec(next_obs):
        return {"obs": obs0, "action": a, "reward": z, "constraint": z,
                "lyap_t": jnp.zeros(spec.lyap_dim),
                "lyap_t1": jnp.zeros(spec.lyap_dim),
                "barrier_signal": z, "next_obs": next_obs,
                "mask": jnp.float32(1.0), "t": z,
                "next_t": jnp.float32(cfg.env.dt)}

    for _ in range(cfg.node.max_batch):
        buf = rlib.push(buf, rec(obs0))           # trivial old records
    for _ in range(64):
        buf = rlib.push(buf, rec(obs_jump))       # fresh on-policy data

    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl_buf = fill_replay(cfg)
    agent = make_agent(cfg)
    # updates counter 0 -> the NODE fit runs on this update
    _, m = jax.jit(agent.update)(ts, rl_buf, buf, jax.random.PRNGKey(7),
                                 jnp.int32(0))
    assert float(m["node_loss"]) > 1.0, (
        f"node_loss={float(m['node_loss'])}: NODE fit appears to sample "
        "only the oldest max_batch records")


def test_target_entropy_override():
    """SacConfig.target_entropy overrides the reference's -dim(A) for the
    temperature update (None reproduces it bit-exactly; a permissive
    override must push alpha DOWN relative to default when the policy sits
    below the default target — the quadrotor ratchet lever, PARITY.md)."""
    cfg = tiny("unicycle")
    # None == explicit -dim(A): bit-equal trajectories
    cfg_explicit = dataclasses.replace(
        cfg, sac=dataclasses.replace(cfg.sac, target_entropy=-2.0))
    s_none, _ = run_updates(cfg, 3)
    s_expl, _ = run_updates(cfg_explicit, 3)
    np.testing.assert_array_equal(np.asarray(s_none[-1].log_alpha),
                                  np.asarray(s_expl[-1].log_alpha))
    # A very permissive target (entropy requirement far below anything
    # the policy produces) must drive alpha down monotonically, and end
    # strictly below the default run's alpha.
    cfg_perm = dataclasses.replace(
        cfg, sac=dataclasses.replace(cfg.sac, target_entropy=-100.0))
    s_perm, m = run_updates(cfg_perm, 3)
    a_perm = [float(jnp.exp(s.log_alpha[0])) for s in s_perm]
    assert a_perm[1] < a_perm[0] and a_perm[2] < a_perm[1]
    assert a_perm[-1] < float(jnp.exp(s_none[-1].log_alpha[0]))
    assert np.isfinite(float(m["alpha_loss"]))


def test_fixed_alpha_uses_alpha_init():
    """With automatic_entropy_tuning=False the temperature is the constant
    SacConfig.alpha_init (reference args.alpha, sac_cbf_clf.py:32-33) —
    NOT exp(0)=1.0 (an r3 bug: the fixed-alpha quadrotor sweep actually
    ran alpha=1.0)."""
    cfg = tiny("unicycle")
    cfg = dataclasses.replace(
        cfg, sac=dataclasses.replace(cfg.sac,
                                     automatic_entropy_tuning=False,
                                     alpha_init=0.37))
    snaps, m = run_updates(cfg, 2)
    assert abs(float(m["alpha"]) - 0.37) < 1e-6
    # log_alpha (and the backup temperature) never move in this mode.
    np.testing.assert_array_equal(np.asarray(snaps[0].log_alpha),
                                  np.asarray(snaps[-1].log_alpha))
    np.testing.assert_array_equal(np.asarray(snaps[0].backup_log_alpha),
                                  np.asarray(snaps[-1].backup_log_alpha))
    assert abs(float(np.exp(snaps[-1].log_alpha[0])) - 0.37) < 1e-6


def test_alpha_init_validated_for_gaussian():
    """alpha_init <= 0 would silently NaN log_alpha (fixed-alpha mode)
    or the first update's temperature (stale-alpha quirk) — reject at
    build time like the other opt-in flags."""
    cfg = tiny("unicycle")
    bad = dataclasses.replace(
        cfg, sac=dataclasses.replace(cfg.sac, alpha_init=-0.2))
    with pytest.raises(ValueError, match="alpha_init"):
        create_train_state(bad, jax.random.PRNGKey(0))


def test_pretanh_reg_shrinks_saturated_mean():
    """SacConfig.pretanh_reg (lever 16, the original SAC pre-activation
    regularizer): 0 leaves the update bit-identical to before the flag
    existed; a positive coefficient produces different policy grads and
    drives a saturated pre-tanh mean DOWN where the unregularized update
    leaves it pinned (the measured quadrotor ground-start trap,
    PARITY.md r7). Deterministic policy rejects it at build time."""
    cfg0 = tiny("unicycle")
    snaps0, _ = run_updates(cfg0, 3)
    cfg_r = dataclasses.replace(
        cfg0, sac=dataclasses.replace(cfg0.sac, pretanh_reg=10.0))
    snaps_r, m = run_updates(cfg_r, 3)
    assert _changed(snaps0[-1].policy, snaps_r[-1].policy)
    for k in ("qf1_loss", "qf2_loss"):  # critic path untouched
        assert np.isfinite(float(m[k]))

    # Inward-pull semantics. Adam's first bias-corrected step is exactly
    # -lr * sign(grad) per parameter, so with a dominating coefficient
    # (1e3 * mu ~ 6e3 vs the ~1e-5 tanh-saturated task gradients) ONE
    # update must move the mean-head bias toward zero by ~policy_lr from
    # BOTH inflation signs — the property that unsticks a saturated
    # corner. (Long-horizon separation is NOT testable through Adam: it
    # normalizes magnitudes, so reg-on/off converge at the same +/-lr
    # speed limit per step and only the direction differs.)
    buf = fill_replay(cfg0)
    cfg_big = dataclasses.replace(
        cfg0, sac=dataclasses.replace(cfg0.sac, pretanh_reg=1e3))
    lr = cfg0.sac.policy_lr

    def bias_after_one(cfg, inflation):
        ts = create_train_state(cfg, jax.random.PRNGKey(0))
        pol = jax.tree.map(lambda x: x, ts.policy)
        pol["mean"]["b"][0] = pol["mean"]["b"][0] + inflation
        ts = ts._replace(policy=pol)
        ts, _ = jax.jit(make_agent(cfg).update)(
            ts, buf, buf, jax.random.PRNGKey(7), jnp.int32(0))
        return np.asarray(ts.policy["mean"]["b"][0])

    for inflation in (6.0, -6.0):
        b = bias_after_one(cfg_big, inflation)
        # moved toward zero by ~lr on every element
        np.testing.assert_allclose(b, inflation - np.sign(inflation) * lr,
                                   atol=lr * 0.2)

    det = dataclasses.replace(
        cfg0, sac=dataclasses.replace(cfg0.sac, policy_type="deterministic",
                                      automatic_entropy_tuning=False,
                                      pretanh_reg=1.0))
    with pytest.raises(ValueError, match="pretanh_reg"):
        make_agent(det)

    # CLI plumbs through; presets default 0
    from nlbac_tpu.config import PRESETS
    from nlbac_tpu.train.cli import build_parser, config_from_args

    for name in PRESETS:
        assert get_config(name).sac.pretanh_reg == 0.0
    args = build_parser().parse_args(
        ["--preset", "quadrotor", "--pretanh_reg", "0.001"])
    assert config_from_args(args).sac.pretanh_reg == 0.001


def test_probe_pretanh_reg_targets_ground_obs():
    """SacConfig.probe_pretanh_reg (lever 18): the mu^2 pull is evaluated
    on the env's fixed ground_probe_obs() batch, so it de-saturates the
    measured quadrotor ground-start trap regardless of replay
    composition (PARITY.md r7 — the replay-averaged lever-16 reg fails
    exactly because ground obs are a sliver of the batch). 0 keeps the
    update bit-identical; envs without a probe batch and the
    deterministic head are rejected at build time."""
    cfg0 = tiny("quadrotor")
    snaps0, _ = run_updates(cfg0, 2)
    cfg_r = dataclasses.replace(
        cfg0, sac=dataclasses.replace(cfg0.sac, probe_pretanh_reg=10.0))
    snaps_r, m = run_updates(cfg_r, 2)
    assert _changed(snaps0[-1].policy, snaps_r[-1].policy)
    for k in ("qf1_loss", "qf2_loss"):  # critic path untouched
        assert np.isfinite(float(m[k]))

    # The probe pull is independent of the replay batch: with a
    # dominating coefficient, one update moves an inflated mean-head
    # bias toward zero by ~policy_lr (Adam's first bias-corrected step
    # is -lr*sign(grad)) from BOTH inflation signs — even though the
    # replay batch contains no ground-start transitions at all.
    buf = fill_replay(cfg0)
    cfg_big = dataclasses.replace(
        cfg0, sac=dataclasses.replace(cfg0.sac, probe_pretanh_reg=1e3))
    lr = cfg0.sac.policy_lr

    def bias_after_one(cfg, inflation):
        ts = create_train_state(cfg, jax.random.PRNGKey(0))
        pol = jax.tree.map(lambda x: x, ts.policy)
        pol["mean"]["b"][0] = pol["mean"]["b"][0] + inflation
        ts = ts._replace(policy=pol)
        ts, _ = jax.jit(make_agent(cfg).update)(
            ts, buf, buf, jax.random.PRNGKey(7), jnp.int32(0))
        return np.asarray(ts.policy["mean"]["b"][0])

    for inflation in (6.0, -6.0):
        b = bias_after_one(cfg_big, inflation)
        np.testing.assert_allclose(b, inflation - np.sign(inflation) * lr,
                                   atol=lr * 0.2)

    # Probe batch itself: fixed, finite, ground-anchored.
    from nlbac_tpu.envs import quadrotor

    probe = np.asarray(quadrotor.ground_probe_obs())
    assert probe.shape[1] == quadrotor.SPEC.obs_dim
    np.testing.assert_array_equal(probe[0], np.asarray(quadrotor.INIT_STATE))
    assert np.isfinite(probe).all()

    # Build-time rejections: env without ground_probe_obs; det head.
    uni = tiny("unicycle")
    bad_env = dataclasses.replace(
        uni, sac=dataclasses.replace(uni.sac, probe_pretanh_reg=1.0))
    with pytest.raises(ValueError, match="ground_probe_obs"):
        make_agent(bad_env)
    det = dataclasses.replace(
        cfg0, sac=dataclasses.replace(cfg0.sac,
                                      policy_type="deterministic",
                                      automatic_entropy_tuning=False,
                                      probe_pretanh_reg=1.0))
    with pytest.raises(ValueError, match="probe_pretanh_reg"):
        make_agent(det)

    # CLI plumbs through; presets default 0.
    from nlbac_tpu.config import PRESETS
    from nlbac_tpu.train.cli import build_parser, config_from_args

    for name in PRESETS:
        assert get_config(name).sac.probe_pretanh_reg == 0.0
    args = build_parser().parse_args(
        ["--preset", "quadrotor", "--probe_pretanh_reg", "0.01"])
    assert config_from_args(args).sac.probe_pretanh_reg == 0.01


def test_decoupled_updates_semantics():
    """Experimental lever (nlbac_tpu.experimental.make_decoupled_agent):
    the policy-gradient paths read the PRE-update
    critic/Lyapunov/barrier/NODE params.

    Pins three facts: (1) the TD losses are untouched (they are pure
    functions of the pre-update state, compared as metrics — post-Adam
    params are NOT comparable across the two compiled programs because
    Adam amplifies one-ULP fusion-rounding differences on near-zero
    gradients to full +/-lr steps); (2) the policy update genuinely
    diverges (it reads a different critic); (3) when the TD optimizers
    are frozen (critic_lr=0 covers critic+Lyapunov+barrier) and the
    NODE fit is gated off, the pre- and post-update approximators
    coincide and the two modes match everywhere to compiler-rounding
    tolerance — the flag's only effect is which side of the optimizer
    step the policy loss reads."""
    from nlbac_tpu.experimental import make_decoupled_agent

    cfg0 = tiny("unicycle")
    ts = create_train_state(cfg0, jax.random.PRNGKey(0))
    buf = fill_replay(cfg0)
    args = (ts, buf, buf, jax.random.PRNGKey(5), jnp.int32(0))
    tsc, mc = jax.jit(make_agent(cfg0).update)(*args)
    tsd, md = jax.jit(make_decoupled_agent(cfg0).update)(*args)
    for k in ("qf1_loss", "qf2_loss", "lf_loss"):
        np.testing.assert_allclose(np.asarray(mc[k]), np.asarray(md[k]),
                                   rtol=1e-5, atol=1e-7)
    assert _changed(tsc.policy, tsd.policy)
    assert _changed(ts.policy, tsd.policy)  # still actually trains

    frozen = dataclasses.replace(
        cfg0,
        sac=dataclasses.replace(cfg0.sac, critic_lr=0.0),
        node=dataclasses.replace(cfg0.node, fit_episode_limit=-1))
    tsc, _ = jax.jit(make_agent(frozen).update)(*args)
    tsd, _ = jax.jit(make_decoupled_agent(frozen).update)(*args)
    for a, b in zip(jax.tree.leaves(tsc), jax.tree.leaves(tsd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
