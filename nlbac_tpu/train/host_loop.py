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

Device work is exactly two jitted calls per env step: action selection
and (buffer-gated) ``agent.update_from_batch``.  The NODE batch is only
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

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nlbac_tpu import replay as replay_lib
from nlbac_tpu.agent import create_train_state, make_agent
from nlbac_tpu.config import NLBACConfig


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

    v1 trains the primary controller only: backup-controller supervision
    is a device-program feature (``make_episode_runner(env_override=...)``
    runs host envs under the full supervisor machinery via io_callback);
    configs with ``use_backup``/a supervisor are rejected loudly."""
    if cfg.constraint.use_backup or cfg.supervisor.kind != "none":
        raise ValueError(
            "host-loop mode trains the primary controller only "
            f"(use_backup={cfg.constraint.use_backup}, supervisor="
            f"{cfg.supervisor.kind!r}); for backup/supervisor workloads "
            "run the fused device program with env_override=adapter "
            "(train/driver.py)")
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

    select = jax.jit(agent.select_action)
    update = jax.jit(agent.update_from_batch)
    # off-cycle NODE-fit updates feed this dead-branch placeholder: same
    # aval as a real node batch, resident on device once, zero H2D cost
    zero_node = jax.device_put(rings.unpack(
        np.zeros((ncfg.max_batch, rings.width), np.float32)))

    updates = 0
    total_steps = 0
    history: List[dict] = []
    for i_episode in range(episodes):
        # copy=True: a gym-style env may return (and later mutate in
        # place) its internal state buffer; stored transitions must not
        # alias it or rec["obs"] silently becomes rec["next_obs"]
        obs = np.array(adapter.host_reset(), np.float32)
        ep_reward = ep_viol = ep_cost = 0.0
        ep_steps = 0
        goal_met = False
        last_train = {}
        done = False
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
            action = np.asarray(select(ts, jnp.asarray(obs), kact,
                                       jnp.array(warmup),
                                       jnp.array(False)))
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
            rings.rl.push(rings.pack(rec))
            if node_t_shift:
                rec = dict(rec, t=t + node_t_shift,
                           next_t=t + dt + node_t_shift)
            rings.node.push(rings.pack(rec))

            ep_reward += float(reward)
            ep_viol += float(viol)
            ep_cost += float(cost)
            goal_met = goal_met or bool(gm)
            obs = np.array(next_obs, np.float32)  # de-alias (see reset)

        row = {"Episode": i_episode, "episode_steps": ep_steps,
               "reward_train": ep_reward, "cost_train": ep_viol,
               "safety_cost_train": ep_cost, "goal_met": float(goal_met),
               "updates": updates}
        # always emit the full loss column set (0.0 before the first
        # update, matching the device driver's _zero_train_metrics) —
        # EpochLogger freezes headers on the first dump_tabular, so a
        # short warm-up episode 0 must not drop the loss columns forever
        for k in ("qf1_loss", "qf2_loss", "lf_loss", "policy_loss",
                  "node_loss"):
            row[k] = float(last_train[k]) if last_train else 0.0
        history.append(row)
        if logger is not None:
            logger.store(**row)
            for k in row:
                logger.log_tabular(k)
            logger.dump_tabular()
        elif not quiet:
            print(f"host ep {i_episode}: reward {ep_reward:.2f} "
                  f"steps {ep_steps} updates {updates}")
    return ts, history
