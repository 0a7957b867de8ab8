"""Host-loop training mode: the data plane on the host, updates on device.

This is the mode whose architecture matches the reference's actual
program (a Python step loop around device-side updates, UNI/main.py:
56-104) — used here for HOST-side environments (safe-control-gym-style
physics, ``envs/host_adapter.HostEnvAdapter``) where the fused on-device
episode program would serialize on per-step ``io_callback`` round trips
anyway.  The RL replay ring lives in the NATIVE C++ host data plane
(``runtime/host_buffer.cpp`` via :mod:`nlbac_tpu.runtime_native`):
pushes are one ``memcpy`` into a preallocated float32 ring (no
per-record Python objects — the reference keeps a Python list of
tuples, UNI/sac_cbf_clf/replay_memory.py:4-28), samples are native
xorshift gathers whose rows ride the step dispatch to the device.

The per-step device traffic is the mode's cost model (the tunneled
backend pays ~30 ms per blocking round trip, and bulk H2D runs at
~40 MB/s — the r5 decomposition in scripts/probe_host_loop_cost.py),
so the loop is built around ONE fused jitted program per step:

- the whole ``updates_per_step`` loop, the supervisor's trigger
  machines, AND action selection run in a single dispatch;
- the NODE replay lives ON DEVICE (``nlbac_tpu.replay``): each step's
  transition rides the control vector (one ~35-float row) and is pushed
  in-program, and the 32768-row fit batch is gathered on device INSIDE
  the interval-gated fit branch — the host-ring design shipped a
  ~4.6 MB batch through the tunnel on every fit-due step (~117 ms
  each, HALF the mode's steady-state step cost);
- the U RL update batches ride the dispatch as one raw
  ``(U, batch, width)`` row array (unpacked on device), and all
  scalars/vectors (obs, counters, flags, the previous step's
  supervisor inputs and NODE row) pack into one float32 control
  vector — the same pack-the-record lesson as the device replay
  (+73%).  Host numpy args go STRAIGHT into the jitted call: the
  implicit transfer pipelines with the dispatch, while an explicit
  ``jax.device_put`` blocks ~30 ms per array;
- the only BLOCKING transfer per step is the action fetch (the env
  cannot step without it); per-step RNG derives from ``fold_in`` of a
  device-resident run key instead of per-step ``jax.random.split``
  dispatches;
- the supervisor's post-step machine for step t is folded into step
  t+1's dispatch (the state is only read at t+1's pre-action), so it
  costs zero extra dispatches; the final step's post-step is dropped —
  the state is re-initialized at the next episode anyway.

Backup-controller semantics are the device driver's: while the backup
controller is active, transitions skip the RL ring but always reach the
NODE ring, and the backup policy trains inside ``update_from_batch``
(UNI/main.py:77-104).

For pure-JAX envs the fused episode program (train/driver.py) is the
fast path; this module exists for host-env workloads and as the product
consumer of the native host data plane.
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nlbac_tpu import replay as replay_lib
from nlbac_tpu.agent import create_train_state, make_agent
from nlbac_tpu.config import NLBACConfig
from nlbac_tpu.constraints import uses_barrier
from nlbac_tpu.envs.base import StepOut


class HostRings:
    """The native RL replay ring + the packed-record layout.

    The NODE replay is NOT a host ring: it lives on device
    (``nlbac_tpu.replay``) because its consumer — the 32768-row
    interval-gated fit batch — is device-side, and shipping it through
    the tunnel cost ~117 ms per fit-due step (module docstring).  The
    loop publishes its latest handle as ``self.node_replay`` for
    introspection/tests."""

    def __init__(self, cfg: NLBACConfig, spec, seed: int = 0):
        from nlbac_tpu.runtime_native import HostReplay

        self.layout = replay_lib.make_layout(spec.obs_dim, spec.action_dim,
                                             spec.lyap_dim)
        self.width = sum(w for _, _, w in self.layout)
        self.rl = HostReplay(cfg.replay.capacity, self.width, seed=seed)
        self.node_replay = None  # set by train_host_env per episode

    def pack(self, record: dict) -> np.ndarray:
        parts = [np.asarray(record[name], np.float32).reshape(w)
                 for name, _, w in self.layout]
        return np.concatenate(parts)

    def unpack(self, rows: np.ndarray) -> dict:
        # pure indexing — works on host numpy rows and device arrays alike
        return replay_lib.unpack_rows(self.layout, rows)


def save_host_checkpoint(path: str, ts, rings: HostRings, node_replay,
                         run_key, updates: int, total_steps: int,
                         i_episode: int, async_writer=None) -> None:
    """Full host-loop training state: train state + the native RL ring
    snapshot (contents, counters, sampler RNG) + the device NODE replay
    + step counters.  Reuses the fused checkpoint format
    (train/checkpoint.py npz+manifest) with the ring snapshot and the
    replay pytree as the replay sections, so the same atomic-write
    machinery serves both modes."""
    from nlbac_tpu.train.checkpoint import save_checkpoint

    d1, m1 = rings.rl.snapshot()
    args = (path, ts, {"data": d1, "meta": m1}, node_replay, run_key,
            total_steps, i_episode)
    extra = {"updates": updates, "mode": "host_loop"}
    if async_writer is not None:
        async_writer.save(*args, extra=extra)
    else:
        save_checkpoint(*args, extra=extra)


def restore_host_checkpoint(path: str, ts_template, rings: HostRings,
                            node_template):
    """Restore a host-loop checkpoint; the RL ring is restored IN PLACE
    into ``rings`` (its buffer stays on the host — the fused-mode
    ``restore_checkpoint`` would round-trip ~45MB through the TPU for
    nothing); returns ``(ts, node_replay, run_key, updates, total_steps,
    i_episode)``."""
    import json

    from nlbac_tpu.train.checkpoint import load_npz_section

    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(bytes(z["manifest"]).decode())
        if manifest.get("extra", {}).get("mode") != "host_loop":
            raise ValueError(
                f"{path} is not a host-loop checkpoint (use --resume "
                f"without --host_loop for fused-mode checkpoints)")
        ts = load_npz_section(z, manifest, "train_state", ts_template)
        node_replay = load_npz_section(z, manifest, "node_replay",
                                       node_template)
        # jax.tree flattens dicts in sorted-key order: ["data", "meta"]
        rings.rl.restore(z["rl_replay.0"], z["rl_replay.1"])
        counters = z["counters"]
        key = z["key"].copy()
        updates = int(manifest["extra"]["updates"])
    # one batched H2D for the device-resident state (per-leaf puts each
    # pay a tunnel round trip — CLAUDE.md)
    ts, node_replay, key = jax.device_put((ts, node_replay, key))
    return (ts, node_replay, key, updates, int(counters[0]),
            int(counters[1]))


def train_host_env(cfg: NLBACConfig, adapter, episodes: Optional[int] = None,
                   seed: Optional[int] = None, logger=None,
                   quiet: bool = True, on_episode_end=None, sink=None,
                   weights_dir: Optional[str] = None,
                   checkpoint_path: Optional[str] = None,
                   resume_path: Optional[str] = None) -> tuple:
    """Train against a :class:`HostEnvAdapter` with the native host data
    plane.  Returns ``(ts, per_episode_metrics)``.

    Durability/observability (the reference host loop's own features,
    VERDICT r4 item 3):

    - ``weights_dir`` — reference-layout weights saved mid-run at the
      ``max_episodes / save_every_fraction`` cadence (UNI/main.py:
      153-154 saves at ``/2``; CARS/main.py:125-126 at ``/6``) and at
      the final episode;
    - ``checkpoint_path`` — FULL state (train state, the native RL
      ring incl. its sampler RNG, the device NODE replay, counters)
      written asynchronously at the same cadence; ``resume_path``
      restores it and continues bit-for-bit
      for shim-wrapped envs (the fold_in RNG scheme needs only the
      restored counters; the reset stream is replayed to re-sync the
      env chain — an external gym env's private RNG state is the one
      thing a host-side checkpoint cannot capture);
    - ``sink`` — a :class:`nlbac_tpu.train.logging.MetricsSink`
      receiving the reference's wandb-channel metric dict per episode
      (UNI/main.py:157-165);
    - ``on_episode_end(i_episode, ts, row)`` — optional host callback
      after each episode's metrics row is materialized.

    Backup-controller supervision runs the SAME pure state machines as
    the fused device program (train/supervisor.py — trap / cars_gap /
    pvtol), fused into the per-step program; while the backup controller
    is active, transitions skip the RL ring but always reach the NODE
    ring, and the backup policy trains inside ``update_from_batch``
    exactly as on-device (the reference's host-loop semantics,
    UNI/main.py:77-104)."""
    if cfg.supervisor.kind != "none" and not cfg.constraint.use_backup:
        # Same loud failure as the device driver: the supervisor would
        # engage a backup controller that is never trained or sampled.
        raise ValueError(
            f"supervisor.kind={cfg.supervisor.kind!r} requires "
            f"constraint.use_backup=True (got False): the backup "
            f"controller it would engage is never trained or sampled")
    scfg, ncfg = cfg.sac, cfg.node
    if scfg.updates_per_step < 1:
        # advisor r4: updates_per_step=0 used to NameError mid-episode
        raise ValueError(
            f"updates_per_step must be >= 1 (got {scfg.updates_per_step})")
    agent = make_agent(cfg, env_override=adapter)
    seed = cfg.run.seed if seed is None else seed
    episodes = cfg.run.max_episodes if episodes is None else episodes
    max_steps = cfg.env.max_episode_steps
    dt = cfg.env.dt
    U = scfg.updates_per_step
    B = scfg.batch_size
    obs_dim = adapter.SPEC.obs_dim
    lyap_dim = adapter.SPEC.lyap_dim

    key = jax.random.PRNGKey(seed)
    key, kinit = jax.random.split(key)
    ts = create_train_state(cfg, kinit)
    # device-resident base key for the whole run; per-step keys derive
    # via fold_in(run_key, total_step) INSIDE the program (a host-level
    # jax.random.split is itself a dispatched device program — U+1 of
    # them per step in the pre-r5 loop)
    run_key, _ = jax.random.split(key)
    rings = HostRings(cfg, adapter.SPEC, seed=seed)

    from nlbac_tpu.train.supervisor import (init_supervisor, post_step,
                                            pre_action)
    sup_cfg = cfg.supervisor

    # ---- the packed control vector (ONE host->device array per step) --
    # [0]=total_step  [1]=i_episode  [2]=warmup  [3]=start_backup
    # [4]=has_prev    [5]=prev_episode_steps  [6]=has_node_row
    # then: obs | prev_obs | prev_next_obs | prev_lyap_t1 | prev_reached
    # | prev_node_row(width) — the previous transition's packed NODE
    # record, pushed in-program into the device NODE replay
    HDR = 7
    CTL = HDR + 3 * obs_dim + lyap_dim + 1 + rings.width

    def _unpack_ctl(ctl):
        o = HDR
        obs = ctl[o:o + obs_dim]; o += obs_dim
        pobs = ctl[o:o + obs_dim]; o += obs_dim
        pnext = ctl[o:o + obs_dim]; o += obs_dim
        plyap = ctl[o:o + lyap_dim]; o += lyap_dim
        preached = ctl[o]; o += 1
        node_row = ctl[o:o + rings.width]
        return obs, pobs, pnext, plyap, preached, node_row

    def _push_node(node_replay, ctl):
        """Push the previous step's transition into the device NODE
        replay (masked on the first step of each episode — that episode
        boundary's pending row is flushed by ``flush_node`` below, so a
        fit at any step samples exactly the rows the reference's
        NODE_memory would hold, UNI/main.py:95-99)."""
        row = _unpack_ctl(ctl)[5]
        return replay_lib.push(node_replay,
                               replay_lib.unpack_rows(rings.layout, row),
                               do_push=ctl[6] > 0.5)

    def _advance_supervisor(sup, ctl):
        """Fold the PREVIOUS step's post-step machine + this step's
        pre-action transition; returns (use_backup, sup)."""
        if sup_cfg.kind == "none":
            return pre_action(sup_cfg, sup, jnp.array(True))
        start = ctl[3] > 0.5
        has_prev = ctl[4] > 0.5
        obs, pobs, pnext, plyap, preached, _ = _unpack_ctl(ctl)
        zero4 = jnp.zeros(4, jnp.float32)
        out_prev = StepOut(
            obs=pnext, reward=jnp.float32(0), constraint=jnp.float32(0),
            lyap_t=jnp.zeros(lyap_dim, jnp.float32), lyap_t1=plyap,
            barrier_signal=jnp.float32(0), done=jnp.array(False),
            goal_met=jnp.array(False), reached=preached,
            num_violations=jnp.float32(0), safety_cost=jnp.float32(0),
            viol_breakdown=zero4, cost_breakdown=zero4)
        posted = post_step(sup_cfg, sup, pobs, out_prev,
                           ctl[5].astype(jnp.int32), start)
        # masked select, not lax.cond: the first step of an episode has
        # no prev and must leave the freshly-initialized state untouched
        sup = jax.tree.map(lambda a, b: jnp.where(has_prev, a, b),
                           posted, sup)
        return pre_action(sup_cfg, sup, start)

    def _select(ts, ctl, sup, run_key):
        use_backup, sup = _advance_supervisor(sup, ctl)
        obs = _unpack_ctl(ctl)[0]
        k_step = jax.random.fold_in(run_key, ctl[0].astype(jnp.int32))
        k_act = jax.random.fold_in(k_step, U)
        action = agent.select_action(ts, obs, k_act, ctl[2] > 0.5,
                                     use_backup)
        return action, use_backup, sup

    @jax.jit
    def step_select(ts, node_replay, ctl, sup, run_key):
        """Warm-up phase program (replay below the update gate) — still
        pushes the NODE row (transitions always reach the NODE replay,
        UNI/main.py:95-99)."""
        node_replay = _push_node(node_replay, ctl)
        action, use_backup, sup = _select(ts, ctl, sup, run_key)
        return node_replay, action, use_backup, sup

    @jax.jit
    def step_train(ts, node_replay, ctl, rl_rows, sup, run_key):
        """Steady-state program: the NODE-row push + ALL updates_per_step
        updates + the supervisor machines + action selection in ONE
        dispatch.

        ``rl_rows``: (U, B, width) raw packed rows, unpacked on device.
        The NODE fit batch is gathered ON DEVICE from ``node_replay``
        inside the interval-gated fit branch (``update_presampled``
        keeps the 32768-row gather lazy — the same keep-the-gather-in-
        the-branch lesson as the fused driver's +67%)."""
        node_replay = _push_node(node_replay, ctl)
        i_ep = ctl[1].astype(jnp.int32)
        k_step = jax.random.fold_in(run_key, ctl[0].astype(jnp.int32))
        m = None
        for j in range(U):  # static unroll, same as the device driver
            batch = rings.unpack(rl_rows[j])
            kj = jax.random.fold_in(k_step, j)
            ts, m = agent.update_presampled(
                ts, batch, node_replay, jax.random.fold_in(kj, 0),
                jax.random.fold_in(kj, 1), i_ep)
        action, use_backup, sup = _select(ts, ctl, sup, run_key)
        return ts, node_replay, action, use_backup, sup, m

    @jax.jit
    def flush_node(node_replay, ctl):
        """Episode-end flush of the final pending NODE row (one tiny
        dispatch per episode) — keeps 'every row is in the replay by
        episode end' true, which both the reference semantics and the
        checkpoint/resume bit-exactness rely on."""
        return _push_node(node_replay, ctl)

    node_replay = replay_lib.create(cfg.replay.node_capacity, obs_dim,
                                    adapter.SPEC.action_dim, lyap_dim)

    updates = 0
    total_steps = 0
    start_episode = 0
    ckpt_writer = None
    if resume_path is not None:
        (ts, node_replay, run_key, updates, total_steps,
         ep0) = restore_host_checkpoint(resume_path, ts, rings,
                                        node_replay)
        start_episode = ep0 + 1
        # replay the reset stream: each completed episode consumed one
        # reset, so fast-forwarding puts a freshly-constructed adapter's
        # RNG chain exactly where an uninterrupted run would be (exact
        # for the host_shim path; an external gym env's private RNG is
        # the one thing a host-side checkpoint cannot capture)
        for _ in range(start_episode):
            adapter.host_reset()
    if checkpoint_path is not None:
        from nlbac_tpu.train.checkpoint import AsyncCheckpointer
        ckpt_writer = AsyncCheckpointer()
    # reference cadence (UNI/main.py:153-154: /2; CARS/main.py:125-126:
    # /6 — config.run.save_every_fraction carries the per-variant value)
    save_every = max(1, episodes // cfg.run.save_every_fraction)
    history: List[dict] = []
    for i_episode in range(start_episode, episodes):
        t_ep = time.perf_counter()
        # copy=True: a gym-style env may return (and later mutate in
        # place) its internal state buffer; stored transitions must not
        # alias it or rec["obs"] silently becomes rec["next_obs"]
        obs = np.array(adapter.host_reset(), np.float32)
        ep_reward = ep_viol = ep_cost = ep_reached = 0.0
        ep_steps = 0
        ep_backup_steps = 0
        goal_met = False
        last_train = None
        done = False
        sup = init_supervisor(sup_cfg)
        # (obs_prev, next_obs, lyap_t1, reached, ep_steps, node_row)
        prev = None
        # reference gating: the trigger machines only arm after the
        # enable episode (UNI/main.py:109 `i_episode > 3`)
        start_backup = float(i_episode >= sup_cfg.enable_after_episodes)
        while not done:
            warmup = total_steps < scfg.start_steps
            ctl = np.zeros(CTL, np.float32)
            ctl[0] = total_steps
            ctl[1] = i_episode
            ctl[2] = float(warmup)
            ctl[3] = start_backup
            o = HDR
            ctl[o:o + obs_dim] = obs
            if prev is not None:
                ctl[4] = 1.0
                ctl[5] = prev[4]
                ctl[6] = 1.0
                ctl[o + obs_dim:o + 2 * obs_dim] = prev[0]
                ctl[o + 2 * obs_dim:o + 3 * obs_dim] = prev[1]
                o += 3 * obs_dim
                ctl[o:o + lyap_dim] = prev[2]
                ctl[o + lyap_dim] = prev[3]
                ctl[o + lyap_dim + 1:] = prev[5]

            # --- ONE dispatch: updates (gate: len(memory) > batch_size,
            # UNI/main.py:59) + NODE push + supervisor + action
            # selection.  numpy args go straight into the jitted call:
            # the implicit arg transfer pipelines with the dispatch
            # (~7ms marginal, measured), while an explicit
            # jax.device_put BLOCKS ~30ms PER ARRAY through the tunnel
            # (scripts/probe_host_loop_cost.py)
            if rings.rl.size > B:
                rows = rings.rl.sample(U * B).reshape(U, B, rings.width)
                (ts, node_replay, action_d, use_backup_d, sup,
                 last_train) = step_train(ts, node_replay, ctl, rows,
                                          sup, run_key)
                updates += U
            else:
                node_replay, action_d, use_backup_d, sup = step_select(
                    ts, node_replay, ctl, sup, run_key)

            # the ONE blocking round trip of the step: the env cannot
            # advance without the action (the backup flag rides along)
            action, use_backup = jax.device_get((action_d, use_backup_d))
            use_backup = bool(use_backup)
            (next_obs, reward, constraint, lyap_t, lyap_t1, barrier,
             done_env, gm, reached, viol, cost) = adapter.host_step(action)
            ep_steps += 1
            total_steps += 1
            at_limit = ep_steps >= max_steps
            done = bool(done_env) or at_limit
            mask = 1.0 if at_limit else float(not bool(done_env))

            # --- replay pushes ----------------------------------------
            t = (ep_steps - 1) * dt
            node_t_shift = dt if ncfg.reference_time_labels else 0.0
            rec = {
                "obs": obs, "action": action, "reward": reward,
                "constraint": constraint, "lyap_t": lyap_t,
                "lyap_t1": lyap_t1, "barrier_signal": barrier,
                "next_obs": next_obs, "mask": mask, "t": t,
                "next_t": t + dt,
            }
            # transitions skip the RL ring while the backup controller is
            # active but always reach the NODE replay (UNI/main.py:
            # 96-104); the NODE row rides the NEXT dispatch's control
            # vector into the device replay
            if not use_backup:
                rings.rl.push(rings.pack(rec))
            if node_t_shift:
                node_row = rings.pack(dict(rec, t=t + node_t_shift,
                                           next_t=t + dt + node_t_shift))
            else:
                node_row = rings.pack(rec)

            # the supervisor's post-step machine + the NODE push consume
            # these at the NEXT step's dispatch (zero extra dispatches)
            prev = (obs, np.asarray(next_obs, np.float32),
                    np.asarray(lyap_t1, np.float32).reshape(lyap_dim),
                    float(reached), float(ep_steps), node_row)

            ep_backup_steps += int(use_backup)
            ep_reward += float(reward)
            ep_viol += float(viol)
            ep_cost += float(cost)
            ep_reached += float(reached)
            goal_met = goal_met or bool(gm)
            obs = np.array(next_obs, np.float32)  # de-alias (see reset)

        # flush the final pending NODE row (one tiny dispatch/episode)
        if prev is not None:
            ctl = np.zeros(CTL, np.float32)
            ctl[6] = 1.0
            ctl[HDR + 3 * obs_dim + lyap_dim + 1:] = prev[5]
            node_replay = flush_node(node_replay, ctl)
        rings.node_replay = node_replay  # introspection/tests

        row = {"Episode": i_episode, "episode_steps": ep_steps,
               "reward_train": ep_reward, "cost_train": ep_viol,
               "safety_cost_train": ep_cost, "goal_met": float(goal_met),
               "reached": ep_reached,
               "updates": updates, "backup_steps": ep_backup_steps}
        # always emit the full loss/diagnostic column set (0.0 before the
        # first update, matching the device driver's _zero_train_metrics)
        # — EpochLogger freezes headers on the first dump_tabular, so a
        # short warm-up episode 0 must not drop the loss columns forever.
        # Same column set as the fused driver (train/cli.py train_cols):
        # rho/lam_max exist precisely to diagnose Lagrangian collapse
        # from progress.txt alone.  ONE batched D2H for the scalars:
        # separate float() reads each pay a tunnel round trip on the
        # axon backend (CLAUDE.md)
        loss_keys = ["qf1_loss", "qf2_loss", "lf_loss", "policy_loss",
                     "alpha_loss", "alpha", "node_loss", "rho", "lam_max"]
        if uses_barrier(cfg.constraint.kind):
            # NBC-family runs append the barrier-critic TD loss, same
            # column convention as the fused driver (train/cli.py)
            loss_keys.append("barrier_td_loss")
        if last_train is not None:
            fetched = jax.device_get({k: last_train[k] for k in loss_keys})
            row.update({k: float(v) for k, v in fetched.items()})
        else:
            row.update({k: 0.0 for k in loss_keys})
        # wall_s rides the RETURNED history only (bench/throughput
        # callers), never the logger columns — progress.txt stays
        # fused-driver-compatible
        history.append(dict(row, wall_s=time.perf_counter() - t_ep))
        if logger is not None:
            logger.store(**row)
            for k in row:
                logger.log_tabular(k)
            logger.dump_tabular()
        elif not quiet:
            print(f"host ep {i_episode}: reward {ep_reward:.2f} "
                  f"steps {ep_steps} updates {updates}")
        if sink is not None:
            # the reference's wandb-channel dict (UNI/main.py:157-165)
            wb = {"Episode Reward": ep_reward,
                  "Episode Length": ep_steps,
                  "Episode Safety Cost": ep_cost,
                  "Episode Number of Safety Violations": ep_viol,
                  "Cumulated Number of steps": total_steps}
            if cfg.env.name == "cars":
                wb["Episode Number of reaching destination"] = ep_reached
            sink.log(wb)
        if (weights_dir is not None or ckpt_writer is not None) and (
                i_episode % save_every == 0
                or i_episode == episodes - 1):
            if weights_dir is not None:
                from nlbac_tpu.train.checkpoint import save_model_weights
                save_model_weights(weights_dir, ts,
                                   include_barrier=uses_barrier(
                                       cfg.constraint.kind))
            if ckpt_writer is not None:
                save_host_checkpoint(checkpoint_path, ts, rings,
                                     node_replay, run_key, updates,
                                     total_steps, i_episode,
                                     async_writer=ckpt_writer)
        if on_episode_end is not None:
            on_episode_end(i_episode, ts, row)
    if ckpt_writer is not None:
        ckpt_writer.wait()
    return ts, history
