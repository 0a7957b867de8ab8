"""Episode driver: the reference's host-side ``train()`` loop
(UNI/main.py:14-186) compiled into a single XLA program per episode.

One ``lax.while_loop`` carries the full training state — env state, both
replay buffers, the agent TrainState, the backup supervisor, and episode
accumulators — so an entire episode (env stepping + action selection +
replay pushes + ``updates_per_step`` gradient updates per step) runs on
device with zero host round-trips.  The outer loop over episodes stays in
Python (it does logging/checkpointing, ~hundreds of iterations).

Semantics notes vs the reference:
- update gate: ``len(memory) > batch_size`` (UNI/main.py:60)
- warmup: random actions while ``total_steps < start_steps`` (:78-81)
- mask = 1 at the time-limit step, else ``not done`` (:93)
- transitions skip the RL buffer while the backup controller is active but
  always reach the NODE buffer (:96-104)
- transition times: we store t = (step-1)*dt (time at transition start)
  and next_t = step*dt for BOTH buffers; the reference's NODE buffer is
  off by one dt (UNI/main.py:102-104) which only perturbs the Cars
  time-input feature — we default to the physically-consistent time,
  and NodeConfig.reference_time_labels (--reference_time_labels)
  restores the reference's off-by-one-dt NODE labels bit-faithfully.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from nlbac_tpu import replay as replay_lib
from nlbac_tpu.agent import TrainState, make_agent
from nlbac_tpu.config import NLBACConfig
from nlbac_tpu.envs import get_env
from nlbac_tpu.train.supervisor import (
    SupervisorState,
    init_supervisor,
    post_step,
    pre_action,
)


class EpisodeMetrics(NamedTuple):
    reward: jnp.ndarray
    steps: jnp.ndarray
    num_violations: jnp.ndarray
    safety_cost: jnp.ndarray
    reached: jnp.ndarray
    goal_met: jnp.ndarray
    viol_breakdown: jnp.ndarray  # (4,)
    cost_breakdown: jnp.ndarray  # (4,)
    backup_steps: jnp.ndarray
    updates_done: jnp.ndarray
    train: Dict[str, jnp.ndarray]  # last update's metrics


class Carry(NamedTuple):
    ts: TrainState
    rl_replay: Any
    node_replay: Any
    env_state: Any
    obs: jnp.ndarray
    sup: SupervisorState
    key: jnp.ndarray
    episode_steps: jnp.ndarray
    total_steps: jnp.ndarray
    done: jnp.ndarray
    metrics: EpisodeMetrics


def _zero_train_metrics():
    z = jnp.float32(0.0)
    return {k: z for k in
            ("qf1_loss", "qf2_loss", "lf_loss", "policy_loss",
             "constraint_loss", "alpha_loss", "alpha", "node_loss",
             "barrier_td_loss", "rho", "lam_max")}


def build_step_kwargs(cfg: NLBACConfig, env) -> dict:
    """The opt-in extra env.step kwargs (static, baked into the compiled
    program): kill_penalty / kill_attitude, passed only when nonzero so
    envs whose step() lacks the kwarg are untouched.  Shared between the
    fused device driver and the host-loop CLI mode (envs.as_host_env
    bakes them into the shim's jitted step)."""
    step_kwargs = {}
    for name in ("kill_penalty", "kill_attitude"):
        value = getattr(cfg.env, name, 0.0)
        if value:
            import inspect

            if name not in inspect.signature(env.step).parameters:
                raise ValueError(
                    f"{name}={value} but env {cfg.env.name!r} step() "
                    f"does not accept it (quadrotor only)")
            step_kwargs[name] = value
    return step_kwargs


def make_episode_runner(cfg: NLBACConfig, env_override=None, *,
                        _update_step=None, _agent=None, dp_mesh=None):
    """Build ``run_episode(ts, rl_replay, node_replay, key, i_episode,
    total_steps) -> (ts, rl_replay, node_replay, EpisodeMetrics,
    total_steps)`` — jit it once, reuse across episodes.

    ``env_override`` runs a non-registry env (e.g. a HostEnvAdapter for
    safe-control-gym physics) under the same fused loop; note host envs
    step through ordered io_callbacks, so the loop is only as fast as the
    host physics.

    ``_update_step(agent, carry, kupd, i_episode) -> (ts, train_metrics)``
    overrides the per-env-step gradient-update block (experimental
    variants only — see nlbac_tpu.experimental; the default is the
    reference's updates_per_step sequential ``agent.update`` calls).

    ``dp_mesh`` shards the update batches over the mesh's 'dp' axis
    (data-parallel training; see parallel/mesh.py make_dp_episode_runner
    for the user-facing wrapper)."""
    env = env_override if env_override is not None else \
        get_env(cfg.env.name)
    agent = _agent if _agent is not None else \
        make_agent(cfg, env_override=env_override, dp_mesh=dp_mesh)
    scfg, ccfg = cfg.sac, cfg.constraint
    dt = cfg.env.dt
    max_steps = cfg.env.max_episode_steps
    barrier_B = cfg.env.barrier_B if cfg.env.barrier_signals else 0.0
    barrier_b = cfg.env.barrier_b if cfg.env.barrier_signals else 0.0

    curriculum_eps = getattr(cfg.env, "spawn_curriculum_episodes", 0)
    use_curriculum = curriculum_eps > 0
    if use_curriculum and not hasattr(env, "reset_curriculum"):
        # Fail loudly: silently falling back to the standard reset would
        # make a mis-targeted curriculum sweep report baseline numbers.
        raise ValueError(
            f"spawn_curriculum_episodes={curriculum_eps} but env "
            f"{cfg.env.name!r} has no reset_curriculum (quadrotor only)")
    curriculum_mode = getattr(cfg.env, "spawn_curriculum_mode", "anneal")
    if curriculum_mode not in ("anneal", "mix", "mix_early"):
        raise ValueError(
            f"spawn_curriculum_mode={curriculum_mode!r} "
            "(anneal | mix | mix_early)")
    if curriculum_mode != "anneal" and not use_curriculum:
        raise ValueError(
            f"spawn_curriculum_mode={curriculum_mode!r} requires "
            "spawn_curriculum_episodes > 0 (the mode only changes what "
            "happens after the anneal window)")
    # Passed only when non-default, mirroring the kill_penalty pattern:
    # the default program stays byte-identical and envs whose
    # reset_curriculum lacks the kwarg are untouched.
    curriculum_kwargs = {}
    if curriculum_mode != "anneal":
        curriculum_kwargs["mode"] = curriculum_mode
        mix_alpha_min = getattr(cfg.env, "spawn_mix_alpha_min", 0.15)
        if mix_alpha_min != 0.15:
            # Range-checked inside reset_curriculum at trace time.
            curriculum_kwargs["mix_alpha_min"] = mix_alpha_min
    elif getattr(cfg.env, "spawn_mix_alpha_min", 0.15) != 0.15:
        raise ValueError(
            "spawn_mix_alpha_min is only read when "
            "spawn_curriculum_mode='mix' — set the mode or drop the flag "
            "(a silently ignored mixture bound would mislabel a sweep)")

    # Opt-in extra step kwargs (static, baked into the compiled program).
    # Only passed when set, so envs whose step() lacks the kwarg are
    # untouched and the default program is byte-identical to before.
    step_kwargs = build_step_kwargs(cfg, env)

    if cfg.supervisor.kind != "none" and not ccfg.use_backup:
        # The supervisor would raise use_backup=True at runtime but
        # select_action statically elides the backup-policy sample when
        # the variant trains no backup controller — the 'engaged' backup
        # would silently never act. No preset mixes these (NBC presets
        # pair use_backup=False with kind='none').
        raise ValueError(
            f"supervisor.kind={cfg.supervisor.kind!r} requires "
            f"constraint.use_backup=True (got False): the backup "
            f"controller it would engage is never trained or sampled")

    # The per-env-step gradient-update block (UNI/main.py:60-74):
    # updates_per_step sequential agent.update calls, each sampling its
    # own batch. The RNG splits here define the canonical key stream —
    # any _update_step override must reproduce them to stay
    # bit-identical (nlbac_tpu.experimental.fused_gather_update_step
    # does, and its test pins it).
    if _update_step is None:
        def _update_step(agent_, c, kupd, i_episode):
            ts, train_m = c.ts, c.metrics.train
            ks = jax.random.split(kupd, scfg.updates_per_step)
            for i in range(scfg.updates_per_step):
                ts, train_m = agent_.update(ts, c.rl_replay,
                                            c.node_replay, ks[i],
                                            i_episode)
            return ts, train_m
    update_step = _update_step

    def run_episode(ts, rl_replay, node_replay, key, i_episode,
                    total_steps):
        key, krst = jax.random.split(key)
        if use_curriculum:
            env_state, obs0 = env.reset_curriculum(
                krst, i_episode, curriculum_eps,
                max_episode_steps=max_steps, **curriculum_kwargs)
        else:
            env_state, obs0 = env.reset(krst, max_episode_steps=max_steps)
        start_backup = i_episode >= cfg.supervisor.enable_after_episodes

        init_metrics = EpisodeMetrics(
            reward=jnp.float32(0), steps=jnp.int32(0),
            num_violations=jnp.float32(0), safety_cost=jnp.float32(0),
            reached=jnp.float32(0), goal_met=jnp.array(False),
            viol_breakdown=jnp.zeros(4, jnp.float32),
            cost_breakdown=jnp.zeros(4, jnp.float32),
            backup_steps=jnp.int32(0), updates_done=jnp.int32(0),
            train=_zero_train_metrics(),
        )
        carry0 = Carry(ts=ts, rl_replay=rl_replay, node_replay=node_replay,
                       env_state=env_state, obs=obs0,
                       sup=init_supervisor(cfg.supervisor), key=key,
                       episode_steps=jnp.int32(0), total_steps=total_steps,
                       done=jnp.array(False), metrics=init_metrics)

        def cond(c: Carry):
            return ~c.done

        def body(c: Carry) -> Carry:
            key, kupd, kact, kstep = jax.random.split(c.key, 4)

            # --- 1. gradient updates (UNI/main.py:60-74) ----------------
            # The `len(memory) > batch_size` gate is a masked select, not a
            # lax.cond: a cond-wrapped update nested in this while_loop
            # trips a TPU-compiler bug (bf16 literal check in constant
            # folding), and the gate is only false for the first
            # ~batch_size steps of the whole run, so the wasted compute is
            # negligible while keeping one branch-free loop body.
            can_update = c.rl_replay.size > scfg.batch_size
            ts, train_m = update_step(agent, c, kupd, i_episode)
            sel = lambda new, old: jax.tree.map(
                lambda n, o: jax.lax.select_n(
                    can_update.astype(jnp.int32), o, n), new, old)
            ts = sel(ts, c.ts)
            train_m = sel(train_m, c.metrics.train)
            upd_inc = jnp.where(can_update, scfg.updates_per_step, 0)

            # --- 2. action selection (+supervisor timer bumps) ----------
            use_backup, sup = pre_action(cfg.supervisor, c.sup,
                                         start_backup)
            warmup = c.total_steps < scfg.start_steps
            action = agent.select_action(ts, c.obs, kact, warmup,
                                         use_backup)

            # --- 3. env step --------------------------------------------
            env_state, out = env.step(c.env_state, action,
                                      barrier_B=barrier_B,
                                      barrier_b=barrier_b,
                                      max_episode_steps=max_steps,
                                      **step_kwargs)
            episode_steps = c.episode_steps + 1
            total_steps = c.total_steps + 1

            # mask: 1 at the time-limit boundary, else not done
            at_limit = episode_steps == max_steps
            mask = jnp.where(at_limit, 1.0,
                             1.0 - out.done.astype(jnp.float32))

            # --- 4. replay pushes ----------------------------------------
            t = (episode_steps.astype(jnp.float32) - 1.0) * dt
            rec = replay_lib.record_from_step(c.obs, action, out, mask, t,
                                              t + dt)
            rl_replay = replay_lib.push(c.rl_replay, rec,
                                        do_push=~use_backup)
            if cfg.node.reference_time_labels:
                # faithful mode: the reference's NODE buffer is one dt
                # late (CARS/main.py:95-97 pushes t=step*dt vs the RL
                # buffer's (step-1)*dt; see NodeConfig)
                node_rec = replay_lib.record_from_step(
                    c.obs, action, out, mask, t + dt, t + 2.0 * dt)
            else:
                node_rec = rec
            node_replay = replay_lib.push(c.node_replay, node_rec)

            # --- 5. supervisor trigger machine ---------------------------
            sup = post_step(cfg.supervisor, sup, c.obs, out, episode_steps,
                            start_backup)

            # --- 6. accumulate episode metrics ---------------------------
            m = c.metrics
            metrics = EpisodeMetrics(
                reward=m.reward + out.reward,
                steps=episode_steps,
                num_violations=m.num_violations + out.num_violations,
                safety_cost=m.safety_cost + out.safety_cost,
                reached=m.reached + out.reached,
                goal_met=jnp.logical_or(m.goal_met, out.goal_met),
                viol_breakdown=m.viol_breakdown + out.viol_breakdown,
                cost_breakdown=m.cost_breakdown + out.cost_breakdown,
                backup_steps=m.backup_steps + use_backup.astype(jnp.int32),
                updates_done=m.updates_done + upd_inc,
                train=train_m,
            )
            return Carry(ts=ts, rl_replay=rl_replay,
                         node_replay=node_replay, env_state=env_state,
                         obs=out.obs, sup=sup, key=key,
                         episode_steps=episode_steps,
                         total_steps=total_steps, done=out.done,
                         metrics=metrics)

        final = jax.lax.while_loop(cond, body, carry0)
        return (final.ts, final.rl_replay, final.node_replay,
                final.metrics, final.total_steps)

    return run_episode


def create_replays(cfg: NLBACConfig, env_override=None):
    env = env_override if env_override is not None else \
        get_env(cfg.env.name)
    spec = env.SPEC
    rl = replay_lib.create(cfg.replay.capacity, spec.obs_dim,
                           spec.action_dim, spec.lyap_dim)
    node = replay_lib.create(cfg.replay.node_capacity, spec.obs_dim,
                             spec.action_dim, spec.lyap_dim)
    return rl, node
