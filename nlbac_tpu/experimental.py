"""Measured-dead-end perf levers, quarantined (VERDICT r2 item 6).

Each function here reproduces a perf experiment whose interleaved A/B
measured a LOSS or noise on v5e (CLAUDE.md perf notes). They exist so the
measurements stay reproducible (scripts/ab_*.py); none is reachable from
the config tree, the CLI, or checkpoints — the default builders in
``agent/update.py`` and ``train/driver.py`` carry no negative-result
branches.

Do NOT wire any of these into a product path without a fresh interleaved
A/B showing >5% expected win (the project's own rule):

- **Stored stacked twin-Q** (:func:`stack_twin_q_state`): both Q-nets'
  layer weights as one leaf per layer with a leading k=2 axis — one
  batched einsum per layer instead of two MLP applies. Measured 0.970x
  (2110 vs 2176 steps/s unicycle medians, scripts/ab_stacked_q.py, r3):
  the k=2 batched einsum loses to two plain matmuls on v5e even with
  zero runtime stack/slice ops.
- **Decoupled policy/TD updates** (:func:`make_decoupled_agent`): policy
  loss at the PRE-update critic/Lyapunov/barrier/NODE so the TD and
  policy subgraphs share no data dependency. Measured 0.978x (2015 vs
  2061 steps/s, scripts/ab_decoupled.py, r8): the program is
  op-count-latency-bound; breaking the dependency changes no op count
  and XLA's schedule of the sequential graph wins.
- **Fused multi-update RL gather** (:func:`fused_gather_update_step`):
  one (updates_per_step*B)-row replay gather per env step instead of
  one per update, bit-identical batches. Measured noise (2236 vs 2252
  steps/s, scripts/ab_fused_gather.py): the saved 128-row gather is ~µs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nlbac_tpu import replay as replay_lib
from nlbac_tpu.agent.state import make_optimizers
from nlbac_tpu.config import NLBACConfig
from nlbac_tpu.nn import twin_q_stack


def stack_twin_q_state(cfg: NLBACConfig, ts):
    """TrainState with the twin-Q params (and target) in the STORED
    stacked layout; values are numerically identical to the plain layout
    (``twin_q_stack`` stacks the same leaves). The critic optimizer state
    is re-initialized on the new tree structure — call this on a FRESH
    state (as the A/B does), not mid-run. ``twin_q_apply`` dispatches on
    the layout, and checkpoint export always writes the reference's
    {'q1','q2'} files (``twin_q_unstack``)."""
    critic = twin_q_stack(ts.critic)
    critic_target = twin_q_stack(ts.critic_target)
    opt_critic = make_optimizers(cfg)["critic"].init(critic)
    return ts._replace(critic=critic, critic_target=critic_target,
                       opt={**ts.opt, "critic": opt_critic})


def make_decoupled_agent(cfg: NLBACConfig, env_override=None):
    """Agent whose policy/backup-policy losses read the PRE-update
    function approximators (one-update-stale critics — a standard SAC
    variation; the reference order is critic-step -> policy-loss-at-new-
    critic, UNI/sac_cbf_clf/sac_cbf_clf.py update_parameters)."""
    from nlbac_tpu.agent.update import make_agent

    return make_agent(cfg, env_override=env_override,
                      _decoupled_updates=True)


def make_decoupled_episode_runner(cfg: NLBACConfig, env_override=None):
    """Episode runner whose update block uses the decoupled agent."""
    from nlbac_tpu.train.driver import make_episode_runner

    return make_episode_runner(
        cfg, env_override=env_override,
        _agent=make_decoupled_agent(cfg, env_override=env_override))


def fused_gather_update_step(cfg: NLBACConfig):
    """An ``_update_step`` hook for ``make_episode_runner``: draw every
    update's RL rows in ONE gather per env step (the buffer is not
    written between the unrolled updates), then feed each update its
    slice via ``agent.update_presampled``. The key splits replicate
    exactly what ``agent.update`` would draw, so batches (hence the
    whole trajectory) are bit-identical to the default path."""
    scfg = cfg.sac
    if scfg.updates_per_step <= 1:
        raise ValueError("fused gather needs updates_per_step > 1 "
                         "(there is nothing to fuse)")

    def update_step(agent, c, kupd, i_episode):
        B = scfg.batch_size
        ks = jax.random.split(kupd, scfg.updates_per_step)
        sub = [jax.random.split(ks[i], 3)
               for i in range(scfg.updates_per_step)]
        hi = jnp.maximum(c.rl_replay.size, 1)
        idx = jnp.concatenate([
            jax.random.randint(sub[i][0], (B,), 0, hi)
            for i in range(scfg.updates_per_step)])
        rows = c.rl_replay.data[idx]
        ts, train_m = c.ts, c.metrics.train
        for i in range(scfg.updates_per_step):
            batch = replay_lib.unpack_rows(c.rl_replay.layout,
                                           rows[i * B:(i + 1) * B])
            ts, train_m = agent.update_presampled(
                ts, batch, c.node_replay, sub[i][1], sub[i][2], i_episode)
        return ts, train_m

    return update_step
