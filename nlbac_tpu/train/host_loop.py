"""Host-loop training mode: the data plane on the host, updates on device.

This is the mode whose architecture matches the reference's actual
program (a Python step loop around device-side updates, UNI/main.py:
56-104) — used here for HOST-side environments (safe-control-gym-style
physics, ``envs/host_adapter.HostEnvAdapter``) where the fused on-device
episode program would serialize on per-step ``io_callback`` round trips
anyway.  The replay rings live in the NATIVE C++ host data plane
(``runtime/host_buffer.cpp`` via :mod:`nlbac_tpu.runtime_native`):

- pushes are one ``memcpy`` into a preallocated float32 ring (no
  per-record Python objects — the reference keeps a Python list of
  tuples, UNI/sac_cbf_clf/replay_memory.py:4-28);
- samples are native xorshift gathers straight into a caller buffer
  that ships to the device as ONE ``jax.device_put`` per update.

Device work is two jitted calls per env step — action selection (fused
with the supervisor's pre-action transition) and (buffer-gated)
``agent.update_from_batch`` — plus, for supervised presets, one more for
the post-step trigger machine (the SAME pure state machine the fused
device program runs, train/supervisor.py).  The NODE batch is only
materialized (sampled + H2D-transferred) on the updates where the
interval-gated fit actually runs — off-cycle updates feed a cached
device-resident zero batch into the ``lax.cond``'s dead branch (the
host mirrors the ``updates % interval`` counter, so the branch is
provably not taken).

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
    """The two native replay rings + the packed-record layout."""

    def __init__(self, cfg: NLBACConfig, spec, seed: int = 0):
        from nlbac_tpu.runtime_native import HostReplay

        self.layout = replay_lib.make_layout(spec.obs_dim, spec.action_dim,
                                             spec.lyap_dim)
        self.width = sum(w for _, _, w in self.layout)
        self.rl = HostReplay(cfg.replay.capacity, self.width, seed=seed)
        self.node = HostReplay(cfg.replay.node_capacity, self.width,
                               seed=seed + 1)

    def pack(self, record: dict) -> np.ndarray:
        parts = [np.asarray(record[name], np.float32).reshape(w)
                 for name, _, w in self.layout]
        return np.concatenate(parts)

    def unpack(self, rows: np.ndarray) -> dict:
        # pure indexing — works on host numpy rows and device arrays alike
        return replay_lib.unpack_rows(self.layout, rows)


def train_host_env(cfg: NLBACConfig, adapter, episodes: Optional[int] = None,
                   seed: Optional[int] = None, logger=None,
                   quiet: bool = True) -> tuple:
    """Train against a :class:`HostEnvAdapter` with the native host data
    plane.  Returns ``(ts, per_episode_metrics)``.

    Backup-controller supervision runs the SAME pure state machines as
    the fused device program (train/supervisor.py — trap / cars_gap /
    pvtol), called per step as two small jitted functions; while the
    backup controller is active, transitions skip the RL ring but always
    reach the NODE ring, and the backup policy trains inside
    ``update_from_batch`` exactly as on-device (the reference's host-loop
    semantics, UNI/main.py:77-104)."""
    if cfg.supervisor.kind != "none" and not cfg.constraint.use_backup:
        # Same loud failure as the device driver: the supervisor would
        # engage a backup controller that is never trained or sampled.
        raise ValueError(
            f"supervisor.kind={cfg.supervisor.kind!r} requires "
            f"constraint.use_backup=True (got False): the backup "
            f"controller it would engage is never trained or sampled")
    agent = make_agent(cfg, env_override=adapter)
    scfg, ncfg = cfg.sac, cfg.node
    seed = cfg.run.seed if seed is None else seed
    episodes = cfg.run.max_episodes if episodes is None else episodes
    max_steps = cfg.env.max_episode_steps
    dt = cfg.env.dt

    key = jax.random.PRNGKey(seed)
    key, kinit = jax.random.split(key)
    ts = create_train_state(cfg, kinit)
    rings = HostRings(cfg, adapter.SPEC, seed=seed)

    # Action selection fused with the supervisor's pre-action transition
    # (backup-flag + timer bumps) so the pair costs ONE device dispatch;
    # with kind='none' pre_action returns a literal False and the backup
    # MLP apply is dead code to XLA — identical to the device driver.
    from nlbac_tpu.train.supervisor import (init_supervisor, post_step,
                                            pre_action)
    sup_cfg = cfg.supervisor

    @jax.jit
    def select(ts, obs, k, warmup, sup, start):
        use_backup, sup = pre_action(sup_cfg, sup, start)
        action = agent.select_action(ts, obs, k, warmup, use_backup)
        return action, use_backup, sup

    sup_post = (jax.jit(lambda sup, obs_prev, out, steps, start:
                        post_step(sup_cfg, sup, obs_prev, out, steps,
                                  start))
                if sup_cfg.kind != "none" else None)
    update = jax.jit(agent.update_from_batch)
    # off-cycle NODE-fit updates feed this dead-branch placeholder: same
    # aval as a real node batch, resident on device once, zero H2D cost
    zero_node = jax.device_put(rings.unpack(
        np.zeros((ncfg.max_batch, rings.width), np.float32)))

    updates = 0
    total_steps = 0
    history: List[dict] = []
    for i_episode in range(episodes):
        t_ep = time.perf_counter()
        # copy=True: a gym-style env may return (and later mutate in
        # place) its internal state buffer; stored transitions must not
        # alias it or rec["obs"] silently becomes rec["next_obs"]
        obs = np.array(adapter.host_reset(), np.float32)
        ep_reward = ep_viol = ep_cost = ep_reached = 0.0
        ep_steps = 0
        ep_backup_steps = 0
        goal_met = False
        last_train = {}
        done = False
        sup = init_supervisor(sup_cfg)
        # reference gating: the trigger machines only arm after the
        # enable episode (UNI/main.py:109 `i_episode > 3`)
        start_backup = np.bool_(i_episode >= sup_cfg.enable_after_episodes)
        while not done:
            # --- gradient updates (gate: len(memory) > batch_size) ----
            if rings.rl.size > scfg.batch_size:
                for _ in range(scfg.updates_per_step):
                    key, kupd = jax.random.split(key)
                    batch = rings.unpack(rings.rl.sample(scfg.batch_size))
                    # mirror the device gate exactly (update.py do_node:
                    # interval AND episode limit) so the off-cycle zero
                    # batch provably feeds a dead lax.cond branch
                    node_due = (updates % ncfg.update_interval == 0
                                and (ncfg.fit_episode_limit is None
                                     or i_episode <= ncfg.fit_episode_limit))
                    if node_due:
                        node_batch = rings.unpack(
                            rings.node.sample(ncfg.max_batch))
                    else:  # dead lax.cond branch — skip sample + H2D
                        node_batch = zero_node
                    ts, m = update(ts, batch, node_batch, kupd,
                                   jnp.int32(i_episode))
                    updates += 1
                last_train = m

            # --- action selection + host env step ---------------------
            key, kact = jax.random.split(key)
            warmup = total_steps < scfg.start_steps
            action_d, use_backup_d, sup = select(ts, jnp.asarray(obs),
                                                 kact, jnp.array(warmup),
                                                 sup, start_backup)
            # ONE synced D2H for the pair (the action fetch already
            # blocks; the backup flag rides along instead of paying its
            # own tunnel round trip)
            action, use_backup = jax.device_get((action_d, use_backup_d))
            use_backup = bool(use_backup)
            (next_obs, reward, constraint, lyap_t, lyap_t1, barrier,
             done_env, gm, reached, viol, cost) = adapter.host_step(action)
            ep_steps += 1
            total_steps += 1
            at_limit = ep_steps >= max_steps
            done = bool(done_env) or at_limit
            mask = 1.0 if at_limit else float(not bool(done_env))

            # --- native replay pushes ---------------------------------
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
            # active but always reach the NODE ring (UNI/main.py:96-104)
            if not use_backup:
                rings.rl.push(rings.pack(rec))
            if node_t_shift:
                rec = dict(rec, t=t + node_t_shift,
                           next_t=t + dt + node_t_shift)
            rings.node.push(rings.pack(rec))

            # --- supervisor trigger machine (same pure state machine as
            # the device program; one extra dispatch per step) ----------
            if sup_post is not None:
                out_t = StepOut(
                    obs=next_obs, reward=np.float32(reward),
                    constraint=np.float32(constraint), lyap_t=lyap_t,
                    lyap_t1=lyap_t1, barrier_signal=np.float32(barrier),
                    done=np.bool_(done_env), goal_met=np.bool_(gm),
                    reached=np.float32(reached),
                    num_violations=np.float32(viol),
                    safety_cost=np.float32(cost),
                    viol_breakdown=np.zeros(4, np.float32),
                    cost_breakdown=np.zeros(4, np.float32))
                sup = sup_post(sup, obs, out_t, np.int32(ep_steps),
                               start_backup)

            ep_backup_steps += int(use_backup)
            ep_reward += float(reward)
            ep_viol += float(viol)
            ep_cost += float(cost)
            ep_reached += float(reached)
            goal_met = goal_met or bool(gm)
            obs = np.array(next_obs, np.float32)  # de-alias (see reset)

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
        if last_train:
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
    return ts, history
