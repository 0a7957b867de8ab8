"""The full training state as one device pytree.

Everything the reference mutates across its update loop — network params,
two optimizers per controller, entropy temperatures, Lagrangian
multipliers, the augmented-penalty coefficient, and the update counter
(SAC_CBF_CLF.__init__, UNI/sac_cbf_clf/sac_cbf_clf.py:28-134) — lives here
as arrays, so the whole agent checkpoints/restores as a single pytree and
updates run inside jit with no host state.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from nlbac_tpu.config import NLBACConfig
from nlbac_tpu.constraints import get_builder, init_lagrangian
from nlbac_tpu.constraints.common import LagrangianState
from nlbac_tpu.nn import (
    ActionSpec,
    barrier_init,
    deterministic_policy_init,
    gaussian_policy_init,
    lyapunov_init,
    node_init,
    twin_q_init,
)


class TrainState(NamedTuple):
    policy: Any
    backup_policy: Any
    critic: Any
    critic_target: Any
    lyap: Any
    lyap_target: Any
    barrier: Any
    barrier_target: Any
    node: Any
    log_alpha: jnp.ndarray
    backup_log_alpha: jnp.ndarray
    opt: dict  # name -> optax state
    lag: LagrangianState
    updates: jnp.ndarray  # i32 update counter


def make_optimizers(cfg: NLBACConfig) -> dict:
    """Adam per parameter group, lrs per the reference
    (policy 3e-4, critic/Lyapunov/barrier 4e-4, NODE 1e-3, alpha 3e-4)."""
    return {
        "policy": optax.adam(cfg.sac.policy_lr),
        "backup_policy": optax.adam(cfg.sac.policy_lr),
        "critic": optax.adam(cfg.sac.critic_lr),
        "lyap": optax.adam(cfg.sac.critic_lr),
        "barrier": optax.adam(cfg.sac.critic_lr),
        "node": optax.adam(cfg.node.lr),
        "alpha": optax.adam(cfg.sac.policy_lr),
        "backup_alpha": optax.adam(cfg.sac.policy_lr),
    }


def create_train_state(cfg: NLBACConfig, key) -> TrainState:
    ks = jax.random.split(key, 8)
    hidden = cfg.sac.hidden_dim
    if cfg.sac.policy_type == "deterministic":
        # The reference's --policy Deterministic branch creates no backup
        # policy and would crash in update_parameters
        # (UNI/sac_cbf_clf/sac_cbf_clf.py:91-95 vs :264); here both
        # controllers get the deterministic head.
        policy = deterministic_policy_init(ks[0], cfg.obs_dim,
                                           cfg.action_dim, hidden)
        backup_policy = deterministic_policy_init(ks[1], cfg.obs_dim,
                                                  cfg.action_dim, hidden)
    else:
        policy = gaussian_policy_init(ks[0], cfg.obs_dim, cfg.action_dim,
                                      hidden)
        backup_policy = gaussian_policy_init(ks[1], cfg.obs_dim,
                                             cfg.action_dim, hidden)
    critic = twin_q_init(ks[2], cfg.obs_dim, cfg.action_dim, hidden)
    lyap = lyapunov_init(ks[3], cfg.lyap_dim, hidden)
    barrier = barrier_init(ks[4], cfg.obs_dim, cfg.action_dim, hidden)
    node = node_init(ks[5], cfg.node)

    builder = get_builder(cfg.constraint.kind)
    lag = init_lagrangian(builder.NUM_PRIMARY, builder.NUM_BACKUP,
                          cfg.constraint.rho_init)

    opts = make_optimizers(cfg)
    # With entropy tuning the reference starts log_alpha at 0
    # (UNI/sac_cbf_clf/sac_cbf_clf.py:78-82; the tuned temperature is
    # exp(log_alpha) from the second update on — the FIRST update's
    # stale args.alpha is handled in agent/update.py).  With tuning OFF
    # the temperature is the constant args.alpha (= SacConfig.alpha_init,
    # --alpha; sac_cbf_clf.py:32-33) — encode it in log_alpha, which the
    # update never touches in that mode.
    if cfg.sac.policy_type != "deterministic" and cfg.sac.alpha_init <= 0:
        raise ValueError(
            f"SacConfig.alpha_init (--alpha) must be > 0 for Gaussian "
            f"policies, got {cfg.sac.alpha_init} (it is the first "
            f"update's temperature, and the constant temperature when "
            f"entropy tuning is off)")
    if cfg.sac.automatic_entropy_tuning or cfg.sac.policy_type == "deterministic":
        init_log_alpha = 0.0
    else:
        init_log_alpha = math.log(cfg.sac.alpha_init)
    log_alpha = jnp.full((1,), init_log_alpha, jnp.float32)
    backup_log_alpha = jnp.full((1,), init_log_alpha, jnp.float32)
    opt = {
        "policy": opts["policy"].init(policy),
        "backup_policy": opts["backup_policy"].init(backup_policy),
        "critic": opts["critic"].init(critic),
        "lyap": opts["lyap"].init(lyap),
        "barrier": opts["barrier"].init(barrier),
        "node": opts["node"].init(node),
        "alpha": opts["alpha"].init(log_alpha),
        "backup_alpha": opts["backup_alpha"].init(backup_log_alpha),
    }
    return TrainState(
        policy=policy, backup_policy=backup_policy,
        critic=critic, critic_target=jax.tree.map(lambda x: x, critic),
        lyap=lyap, lyap_target=jax.tree.map(lambda x: x, lyap),
        barrier=barrier,
        barrier_target=jax.tree.map(lambda x: x, barrier),
        node=node, log_alpha=log_alpha,
        backup_log_alpha=backup_log_alpha, opt=opt, lag=lag,
        updates=jnp.int32(0),
    )


def action_spec(cfg: NLBACConfig) -> ActionSpec:
    from nlbac_tpu.envs import get_env
    spec = get_env(cfg.env.name).SPEC
    return ActionSpec.from_bounds(jnp.array(spec.action_low),
                                  jnp.array(spec.action_high))
