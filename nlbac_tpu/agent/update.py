"""The NLBAC update step: everything the reference's
``SAC_CBF_CLF.update_parameters`` does (UNI/sac_cbf_clf/sac_cbf_clf.py:181-319,
PVTOL variant :181-340), as ONE pure jittable function over the TrainState.

Per call (matching the reference's sequencing exactly):

1. interval-gated NODE fit on a bounded sample of the NODE buffer
   (``lax.cond`` replaces the ``updates % interval`` Python branch; the
   dynamic ``min(position, 32768)`` batch becomes a static-shape sample
   bounded by a dynamic max index)
2. twin-Q TD + Lyapunov TD (+ barrier TD for NBC), each with its own Adam
3. primary policy loss = SAC term (with the FRESH critic) + augmented-
   Lagrangian constraint term; multiplier ascent and rho growth are
   device-side state transitions inside the loss
4. backup policy branch (interval-gated for PVTOL), CBF-only constraints,
   shared or separate rho per config
5. entropy-temperature updates for both controllers
6. interval-gated soft target updates

Returns (TrainState, metrics-dict) — the reference's 6-tuple plus extras.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from nlbac_tpu import replay as replay_lib
from nlbac_tpu.agent.state import TrainState, make_optimizers
from nlbac_tpu.config import NLBACConfig
from nlbac_tpu.constraints import backup_loss as lag_backup_loss
from nlbac_tpu.constraints import get_builder, uses_barrier
from nlbac_tpu.constraints import primary_loss as lag_primary_loss
from nlbac_tpu.envs import get_env
from nlbac_tpu.nn import (
    ActionSpec,
    barrier_apply,
    gaussian_policy_forward,
    gaussian_policy_sample,
    lyapunov_apply,
    make_field,
    node_loss,
    soft_update,
    twin_q_apply,
)


def _mse(a, b):
    return jnp.mean(jnp.square(a - b))


class Agent(NamedTuple):
    """Static bundle: config + pure functions (select_action / update)."""

    cfg: NLBACConfig
    select_action: Callable
    update: Callable
    update_presampled: Callable
    update_from_batch: Callable
    node_fit: Callable


def make_agent(cfg: NLBACConfig, env_override=None, *,
               _decoupled_updates: bool = False,
               dp_mesh=None, dp_axis: str = "dp") -> Agent:
    """``env_override`` substitutes a non-registry environment (e.g. a
    HostEnvAdapter wrapping safe-control-gym). It must expose SPEC plus
    obs_to_state / state_to_obs adapters (identity for envs whose obs IS
    the NODE state).

    ``dp_mesh`` makes every update shard its sampled batches over the
    mesh's ``dp_axis`` (sharding constraints on the batch arrays; GSPMD
    turns the batch-mean reductions — gradients included — into psums
    over ICI). The update math is unchanged; see parallel/mesh.py.

    ``_decoupled_updates`` is an experimental measured-loss variant
    reachable only through nlbac_tpu.experimental.make_decoupled_agent."""
    env = env_override if env_override is not None else \
        get_env(cfg.env.name)
    builder = get_builder(cfg.constraint.kind)
    field = make_field(cfg.node)
    spec = ActionSpec.from_bounds(jnp.array(env.SPEC.action_low),
                                  jnp.array(env.SPEC.action_high))
    opts = make_optimizers(cfg)
    ccfg, ncfg, scfg = cfg.constraint, cfg.node, cfg.sac
    dt = cfg.env.dt
    # Reference: -dim(A) in the scaled action space (UNI/sac_cbf_clf/
    # sac_cbf_clf.py:78-82); SacConfig.target_entropy overrides (see the
    # calibration note there).
    target_entropy = (-float(cfg.action_dim)
                      if scfg.target_entropy is None
                      else float(scfg.target_entropy))
    # Barrier-critic training is a BUILDER property, not a kind-string
    # match: third-party NBC-family builders declare USES_BARRIER = True
    # (constraints.uses_barrier; examples/custom_barrier_env.py) and get
    # the same TD training + target soft-updates as the built-in
    # learned_barrier module.
    is_nbc = uses_barrier(ccfg.kind)
    is_gaussian = scfg.policy_type != "deterministic"
    entropy_tuning = scfg.automatic_entropy_tuning and is_gaussian
    pretanh_reg = float(getattr(scfg, "pretanh_reg", 0.0))
    if pretanh_reg and not is_gaussian:
        raise ValueError(
            f"pretanh_reg={pretanh_reg} requires the Gaussian policy "
            "(the deterministic head has no pre-tanh Gaussian mean to "
            "regularize)")
    probe_pretanh_reg = float(getattr(scfg, "probe_pretanh_reg", 0.0))
    probe_obs = None
    if probe_pretanh_reg:
        if not is_gaussian:
            raise ValueError(
                f"probe_pretanh_reg={probe_pretanh_reg} requires the "
                "Gaussian policy (no pre-tanh mean to regularize)")
        probe_fn = getattr(env, "ground_probe_obs", None)
        if probe_fn is None:
            raise ValueError(
                f"probe_pretanh_reg={probe_pretanh_reg} requires an env "
                f"exposing ground_probe_obs(); {cfg.env.name!r} does not "
                "(quadrotor only)")
        probe_obs = probe_fn()

    if is_gaussian:
        def sample_fn(params, obs_b, key):
            return gaussian_policy_sample(params, obs_b, key, spec)
    else:
        # Deterministic head: tanh(mean)*scale+bias + clipped N(0, 0.1)
        # noise, zero log-prob, alpha forced to 0 (reference model.py:
        # 136-168, sac_cbf_clf.py:91-95).
        from nlbac_tpu.nn import deterministic_policy_sample

        def sample_fn(params, obs_b, key):
            return deterministic_policy_sample(params, obs_b, key, spec)
    action_low = jnp.array(env.SPEC.action_low, jnp.float32)
    action_high = jnp.array(env.SPEC.action_high, jnp.float32)

    # obs -> NODE-state adapter (UNI/sac_cbf_clf/dynamics.py per variant)
    if env_override is None and cfg.env.name == "pvtol":
        obs_to_node_state = env.obs_to_dynamics_state
    elif hasattr(env, "obs_to_state"):
        obs_to_node_state = env.obs_to_state
    else:
        obs_to_node_state = lambda obs: obs  # host env: obs IS the state

    # ------------------------------------------------------------------
    # Action selection (UNI/sac_cbf_clf/sac_cbf_clf.py:136-177)
    # ------------------------------------------------------------------
    def select_action(ts: TrainState, obs, key, warmup, use_backup):
        """obs: (obs_dim,). warmup/use_backup: traced bools."""
        k1, k2, k3 = jax.random.split(key, 3)
        obs_b = obs[None, :]
        a_pri, _, _ = sample_fn(ts.policy, obs_b, k1)
        if ccfg.use_backup:
            a_bak, _, _ = sample_fn(ts.backup_policy, obs_b, k2)
            a = jnp.where(use_backup, a_bak, a_pri)
        else:
            # Variant has no backup controller (NBC presets: zero
            # `backup` refs in NBC-UNI/sac_cbf_clf.py, SURVEY §2.2) —
            # skip the per-step backup MLP apply instead of sampling an
            # action the select below never picks.  k2 is still split
            # off above so the RNG stream (hence every trajectory) is
            # bit-identical to the previous program.
            a = a_pri
        a_rand = jax.random.uniform(k3, (1, cfg.action_dim),
                                    minval=action_low, maxval=action_high)
        a = jnp.where(warmup, a_rand, a)
        return a[0]

    # ------------------------------------------------------------------
    # NODE fit (model.py train_step; gating sac_cbf_clf.py:205-219)
    # ------------------------------------------------------------------
    def node_fit(node_params, node_opt, node_replay, key):
        # Sample ncfg.max_batch indices from the WHOLE buffer [0, size):
        # the reference bounds the BATCH SIZE at min(position, 32768) but
        # samples from the entire buffer (UNI/sac_cbf_clf/sac_cbf_clf.py:
        # 205-208, replay_memory.py:23).  Bounding the index range instead
        # would freeze dynamics-model training on the oldest 32768
        # (mostly random-warmup) transitions once the buffer grows past
        # max_batch.
        batch = replay_lib.sample(node_replay, key, ncfg.max_batch)
        return node_fit_batch(node_params, node_opt, batch)

    def node_fit_batch(node_params, node_opt, batch):
        x = obs_to_node_state(batch["obs"])
        x_next = obs_to_node_state(batch["next_obs"])
        t = batch["t"][:, None] if ncfg.time_input else None
        loss, grads = jax.value_and_grad(
            lambda p: node_loss(ncfg, p, x, batch["action"], x_next, dt,
                                t=t, field=field))(node_params)
        updates, node_opt = opts["node"].update(grads, node_opt, node_params)
        node_params = optax.apply_updates(node_params, updates)
        return node_params, node_opt, loss

    # ------------------------------------------------------------------
    # The fused update step
    # ------------------------------------------------------------------
    def update(ts: TrainState, rl_replay, node_replay, key, i_episode
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Sample both buffers on device, then run the batch update.

        The NODE sample is passed as a thunk so the 32768-row gather (and
        the packed-record unpack slices) trace into the gated fit branch
        only — on the ~(1 - 1/update_interval) of updates where the fit is
        skipped, ``lax.cond`` skips the gather too.  The RNG stream is
        unchanged (keys[1] is split either way)."""
        keys = jax.random.split(key, 3)
        batch = replay_lib.sample(rl_replay, keys[0], scfg.batch_size)
        # whole-buffer sampling — see node_fit above for why there is no
        # max_index bound here (reference parity)
        node_thunk = lambda: replay_lib.sample(node_replay, keys[1],
                                               ncfg.max_batch)
        return _update_core(ts, batch, node_thunk, keys[2], i_episode)

    def update_presampled(ts: TrainState, batch, node_replay, node_key,
                          core_key, i_episode
                          ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Update over a pre-gathered RL batch while keeping the NODE
        sample lazy (traced into the gated fit branch).  Used by the
        driver's fused multi-update gather: it draws both updates' RL
        rows in ONE gather per step, then feeds each update its slice.
        ``node_key``/``core_key`` must be the same splits ``update``
        would have made so the RNG stream (and hence the math) is
        bit-identical."""
        node_thunk = lambda: replay_lib.sample(node_replay, node_key,
                                               ncfg.max_batch)
        return _update_core(ts, batch, node_thunk, core_key, i_episode)

    def update_from_batch(ts: TrainState, batch, node_batch, key, i_episode
                          ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """The batch update over pre-sampled batches (dp entry point).
        Shard ``batch``/``node_batch`` arrays over a 'dp' mesh axis
        (replicating ts) and GSPMD turns the batch-mean reductions into
        psums over ICI — data-parallel training without touching this
        function (see nlbac_tpu.parallel)."""
        return _update_core(ts, batch, lambda: node_batch, key, i_episode)

    if dp_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        def _shard_dp(batch_dict):
            """Constrain every batch array's leading (batch) axis onto the
            dp mesh axis — the one annotation that makes GSPMD shard the
            whole update (forward, grads, Adam reductions) data-parallel."""
            def put(x):
                spec = PartitionSpec(dp_axis, *([None] * (x.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(dp_mesh, spec))
            return {k: put(v) for k, v in batch_dict.items()}
    else:
        _shard_dp = None

    def _update_core(ts: TrainState, batch, node_batch_thunk, key, i_episode
                     ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        keys = jax.random.split(key, 8)
        if _shard_dp is not None:
            batch = _shard_dp(batch)
            inner_thunk = node_batch_thunk
            node_batch_thunk = lambda: _shard_dp(inner_thunk())
        obs, action = batch["obs"], batch["action"]
        if obs.shape[0] != scfg.batch_size:
            # filtered_means normalizes constraint columns by the
            # CONFIGURED batch size — a mismatched pre-sampled batch
            # (dp/update_presampled entry points) would silently
            # mis-scale every constraint mean and the multiplier ascent
            raise ValueError(
                f"batch has {obs.shape[0]} rows but cfg.sac.batch_size="
                f"{scfg.batch_size}; constraint means are normalized by "
                "the configured size, so they must match")
        reward = batch["reward"][:, None]
        constraint = batch["constraint"][:, None]
        mask = batch["mask"][:, None]
        updates_ctr = ts.updates

        # --- 1. NODE fit (gated) ---------------------------------------
        do_node = (updates_ctr % ncfg.update_interval == 0)
        if ncfg.fit_episode_limit is not None:
            do_node = jnp.logical_and(do_node,
                                      i_episode <= ncfg.fit_episode_limit)

        def fit(args):
            return node_fit_batch(args[0], args[1], node_batch_thunk())

        def skip(args):
            return args[0], args[1], jnp.float32(0.0)

        node_params, node_opt, node_fit_loss = jax.lax.cond(
            do_node, fit, skip, (ts.node, ts.opt["node"]))

        # --- 2. critic / Lyapunov / barrier TD --------------------------
        # Stale-alpha quirk (UNI/sac_cbf_clf/sac_cbf_clf.py:32-33,299):
        # the reference's update N consumes self.alpha as left by update
        # N-1 — which is args.alpha for N=1 (log_alpha starts at 0 but
        # exp(log_alpha) only overwrites self.alpha at the END of each
        # update). Reading ts.log_alpha gives the N>=2 value; the first
        # update must use alpha_init. With tuning off log_alpha encodes
        # alpha_init, so the select is a no-op there.
        alpha = (jnp.where(updates_ctr == 0,
                           jnp.float32(scfg.alpha_init),
                           jnp.exp(ts.log_alpha[0]))
                 if is_gaussian else jnp.float32(0.0))
        next_a, next_logp, _ = sample_fn(ts.policy, batch["next_obs"],
                                         keys[2])
        q1_t, q2_t = twin_q_apply(ts.critic_target, batch["next_obs"],
                                  next_a)
        min_q_t = jnp.minimum(q1_t, q2_t) - alpha * next_logp
        next_q = jax.lax.stop_gradient(reward + mask * scfg.gamma * min_q_t)

        lf_t = lyapunov_apply(ts.lyap_target, batch["lyap_t1"])
        next_l = jax.lax.stop_gradient(constraint + mask * scfg.gamma * lf_t)

        def critic_loss_fn(p):
            q1, q2 = twin_q_apply(p, obs, action)
            l1, l2 = _mse(q1, next_q), _mse(q2, next_q)
            return l1 + l2, (l1, l2)

        (qf_loss, (qf1_loss, qf2_loss)), cgrads = jax.value_and_grad(
            critic_loss_fn, has_aux=True)(ts.critic)
        cupd, critic_opt = opts["critic"].update(cgrads, ts.opt["critic"],
                                                 ts.critic)
        critic = optax.apply_updates(ts.critic, cupd)

        def lyap_loss_fn(p):
            return _mse(lyapunov_apply(p, batch["lyap_t"]), next_l)

        lf_loss, lgrads = jax.value_and_grad(lyap_loss_fn)(ts.lyap)
        lupd, lyap_opt = opts["lyap"].update(lgrads, ts.opt["lyap"], ts.lyap)
        lyap = optax.apply_updates(ts.lyap, lupd)

        barrier, barrier_opt = ts.barrier, ts.opt["barrier"]
        barrier_td_loss = jnp.float32(0.0)
        if is_nbc:
            b_sig = batch["barrier_signal"][:, None]
            b_t = barrier_apply(ts.barrier_target, batch["next_obs"],
                                next_a)
            next_b = jax.lax.stop_gradient(b_sig + mask * scfg.gamma * b_t)

            def barrier_loss_fn(p):
                return _mse(barrier_apply(p, obs, action), next_b)

            barrier_td_loss, bgrads = jax.value_and_grad(
                barrier_loss_fn)(ts.barrier)
            bupd, barrier_opt = opts["barrier"].update(
                bgrads, ts.opt["barrier"], ts.barrier)
            barrier = optax.apply_updates(ts.barrier, bupd)

        # Experimental variant (nlbac_tpu.experimental.make_decoupled_agent;
        # measured loss, see that module): policy-gradient paths at the
        # PRE-update function approximators. The reference order (policy
        # loss at the just-stepped critic, UNI/sac_cbf_clf/sac_cbf_clf.py
        # update_parameters) is the default; static Python branch, so
        # default programs are byte-identical.
        if _decoupled_updates:
            pg_critic, pg_lyap, pg_barrier = ts.critic, ts.lyap, ts.barrier
            pg_node = ts.node
        else:
            pg_critic, pg_lyap, pg_barrier = critic, lyap, barrier
            pg_node = node_params

        # --- 3. primary policy -------------------------------------------
        do_lam = (updates_ctr % ccfg.lambda_update_interval == 0)
        # Lever 10 (config.ConstraintConfig.lagrangian_warmup_episodes):
        # freeze multiplier ascent + rho growth until episode N so the
        # schedule cannot outpace early policy learning. Static False by
        # default: lag_live=True keeps every reference preset's program
        # byte-identical (no extra select ops).
        if ccfg.lagrangian_warmup_episodes > 0:
            lag_live = i_episode >= ccfg.lagrangian_warmup_episodes
            do_lam = jnp.logical_and(do_lam, lag_live)
        else:
            lag_live = True

        def make_resampler(policy_params):
            def resample(o, k):
                a, _, _ = sample_fn(policy_params, o, k)
                return a
            return resample

        term_kwargs = dict(
            ccfg=ccfg, ncfg=ncfg, node_params=pg_node, field=field,
            lyap_params=pg_lyap, lyap_t=batch["lyap_t"], dt=dt,
            t=batch["t"][:, None], next_t=batch["next_t"][:, None],
            env_name=cfg.env.name, barrier_params=pg_barrier,
        )

        def policy_loss_fn(p):
            pi, logp, _ = sample_fn(p, obs, keys[3])
            q1, q2 = twin_q_apply(pg_critic, obs, pi)
            min_q = jnp.minimum(q1, q2)
            loss1 = jnp.mean(jax.lax.stop_gradient(alpha) * logp - min_q)
            terms = builder.terms(obs=obs, action=pi, key=keys[4],
                                  resample=make_resampler(p),
                                  include_clf=True, **term_kwargs)
            loss2, lam_new, rho1 = lag_primary_loss(
                ccfg, terms, ts.lag.lam, ts.lag.rho, do_lam,
                scfg.batch_size, do_rho_growth=lag_live)
            loss = loss1 + loss2
            if pretanh_reg:
                # Lever 16 (SacConfig.pretanh_reg): the original SAC
                # codebase's pre-activation regularizer. Keeps the
                # Gaussian mean out of the tanh-saturation corners where
                # the policy gradient vanishes (measured quadrotor
                # ground-start trap, PARITY.md r7). Static 0 by default:
                # every reference preset's program stays byte-identical
                # (XLA CSEs the extra trunk forward with sample_fn's).
                mu, _ = gaussian_policy_forward(p, obs)
                loss = loss + pretanh_reg * jnp.mean(jnp.square(mu))
            if probe_pretanh_reg:
                # Lever 18 (SacConfig.probe_pretanh_reg): same mu^2 pull
                # but evaluated on the env's fixed ground-probe batch, so
                # de-saturation pressure reaches the measured trap state
                # regardless of replay composition (PARITY.md r7).
                mu_p, _ = gaussian_policy_forward(p, probe_obs)
                loss = loss + probe_pretanh_reg * jnp.mean(
                    jnp.square(mu_p))
            return loss, (logp, lam_new, rho1, loss1, loss2)

        (_, (logp, lam_new, rho1, policy_loss_1, policy_loss_2)), pgrads = \
            jax.value_and_grad(policy_loss_fn, has_aux=True)(ts.policy)
        pupd, policy_opt = opts["policy"].update(pgrads, ts.opt["policy"],
                                                 ts.policy)
        policy = optax.apply_updates(ts.policy, pupd)

        # --- 4. backup policy branch ------------------------------------
        backup_policy = ts.backup_policy
        backup_policy_opt = ts.opt["backup_policy"]
        backup_log_alpha = ts.backup_log_alpha
        backup_alpha_opt = ts.opt["backup_alpha"]
        backup_lam = ts.lag.backup_lam
        if ccfg.use_backup:
            backup_rho_in = (ts.lag.backup_rho if ccfg.separate_backup_rho
                             else rho1)
            # Same stale-alpha quirk as the primary temperature
            # (sac_cbf_clf.py:33,308): update 1 uses args.alpha.
            backup_alpha = (jnp.where(updates_ctr == 0,
                                      jnp.float32(scfg.alpha_init),
                                      jnp.exp(ts.backup_log_alpha[0]))
                            if is_gaussian else jnp.float32(0.0))

            def backup_branch(args):
                (bp, bp_opt, bla, bla_opt, blam, brho) = args

                def backup_loss_fn(p):
                    bpi, blogp, _ = sample_fn(p, obs, keys[5])
                    q1, q2 = twin_q_apply(pg_critic, obs, bpi)
                    min_q = jnp.minimum(q1, q2)
                    loss1 = jnp.mean(
                        jax.lax.stop_gradient(backup_alpha) * blogp - min_q)
                    terms = builder.terms(obs=obs, action=bpi, key=keys[6],
                                          resample=make_resampler(p),
                                          include_clf=False, **term_kwargs)
                    loss2, blam_new, brho_new = lag_backup_loss(
                        ccfg, terms, blam, brho, do_lam, scfg.batch_size,
                        do_rho_growth=lag_live)
                    return loss1 + loss2, (blogp, blam_new, brho_new)

                (_, (blogp, blam_new, brho_new)), bgrads = \
                    jax.value_and_grad(backup_loss_fn, has_aux=True)(bp)
                bupd, bp_opt = opts["backup_policy"].update(bgrads, bp_opt,
                                                            bp)
                bp = optax.apply_updates(bp, bupd)

                if entropy_tuning:
                    ent_err = jax.lax.stop_gradient(
                        jnp.mean(blogp) + target_entropy)

                    def ba_loss(la):
                        return -(la[0] * ent_err)

                    bagrads = jax.grad(ba_loss)(bla)
                    baupd, bla_opt = opts["backup_alpha"].update(
                        bagrads, bla_opt, bla)
                    bla = optax.apply_updates(bla, baupd)
                return (bp, bp_opt, bla, bla_opt, blam_new, brho_new)

            args = (backup_policy, backup_policy_opt, backup_log_alpha,
                    backup_alpha_opt, backup_lam, backup_rho_in)
            if ccfg.backup_update_interval > 1:
                do_backup = (updates_ctr % ccfg.backup_update_interval == 0)
                out = jax.lax.cond(do_backup, backup_branch, lambda a: a,
                                   args)
            else:
                out = backup_branch(args)
            (backup_policy, backup_policy_opt, backup_log_alpha,
             backup_alpha_opt, backup_lam, backup_rho_out) = out
            if ccfg.separate_backup_rho:
                rho_final, backup_rho_final = rho1, backup_rho_out
            else:
                rho_final, backup_rho_final = (backup_rho_out,
                                               ts.lag.backup_rho)
        else:
            rho_final, backup_rho_final = rho1, ts.lag.backup_rho

        # --- 5. primary entropy temperature ------------------------------
        log_alpha, alpha_opt = ts.log_alpha, ts.opt["alpha"]
        alpha_loss = jnp.float32(0.0)
        if entropy_tuning:
            ent_err = jax.lax.stop_gradient(jnp.mean(logp) + target_entropy)

            def a_loss(la):
                return -(la[0] * ent_err)

            alpha_loss = a_loss(log_alpha)
            agrads = jax.grad(a_loss)(log_alpha)
            aupd, alpha_opt = opts["alpha"].update(agrads, alpha_opt,
                                                   log_alpha)
            log_alpha = optax.apply_updates(log_alpha, aupd)

        # --- 6. soft target updates --------------------------------------
        def do_soft(targets):
            ct, lt, bt = targets
            ct = soft_update(ct, critic, scfg.tau)
            lt = soft_update(lt, lyap, scfg.tau)
            if is_nbc:
                bt = soft_update(bt, barrier, scfg.tau)
            return ct, lt, bt

        targets = (ts.critic_target, ts.lyap_target, ts.barrier_target)
        if scfg.target_update_interval > 1:
            do_t = (updates_ctr % scfg.target_update_interval == 0)
            critic_target, lyap_target, barrier_target = jax.lax.cond(
                do_t, do_soft, lambda t: t, targets)
        else:
            critic_target, lyap_target, barrier_target = do_soft(targets)

        new_lag = ts.lag._replace(lam=lam_new, backup_lam=backup_lam,
                                  rho=rho_final,
                                  backup_rho=backup_rho_final)
        new_ts = ts._replace(
            policy=policy, backup_policy=backup_policy, critic=critic,
            critic_target=critic_target, lyap=lyap,
            lyap_target=lyap_target, barrier=barrier,
            barrier_target=barrier_target, node=node_params,
            log_alpha=log_alpha, backup_log_alpha=backup_log_alpha,
            opt={**ts.opt, "policy": policy_opt,
                 "backup_policy": backup_policy_opt, "critic": critic_opt,
                 "lyap": lyap_opt, "barrier": barrier_opt,
                 "node": node_opt, "alpha": alpha_opt,
                 "backup_alpha": backup_alpha_opt},
            lag=new_lag, updates=updates_ctr + 1,
        )
        metrics = {
            "qf1_loss": qf1_loss, "qf2_loss": qf2_loss, "lf_loss": lf_loss,
            "policy_loss": policy_loss_1, "constraint_loss": policy_loss_2,
            "alpha_loss": alpha_loss,
            "alpha": (jnp.exp(log_alpha[0]) if is_gaussian
                      else jnp.float32(0.0)),
            "node_loss": node_fit_loss, "barrier_td_loss": barrier_td_loss,
            "rho": rho_final, "lam_max": jnp.max(lam_new),
        }
        return new_ts, metrics

    return Agent(cfg=cfg, select_action=select_action, update=update,
                 update_presampled=update_presampled,
                 update_from_batch=update_from_batch, node_fit=node_fit)
