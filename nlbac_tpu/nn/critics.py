"""Critics: twin Q-network, Lyapunov network, barrier network.

Parity anchors: QNetwork twin 2x256 MLPs over concat(s, a)
(UNI/sac_cbf_clf/model.py:37-64); LyaNetwork 2x256 MLP -> 1 over the
Lyapunov input (model.py:67-83); BarrierNetwork 2x256 MLP -> 1 over
concat(obs, a) (NBC-UNI/sac_cbf_clf/model.py:67-86).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nlbac_tpu.nn.mlp import mlp_apply, mlp_init


def twin_q_init(key, obs_dim: int, action_dim: int, hidden: int):
    k1, k2 = jax.random.split(key)
    sizes = [obs_dim + action_dim, hidden, hidden, 1]
    return {"q1": mlp_init(k1, sizes), "q2": mlp_init(k2, sizes)}


def twin_q_apply(params, obs, action):
    xu = jnp.concatenate([obs, action], axis=-1)
    return mlp_apply(params["q1"], xu), mlp_apply(params["q2"], xu)


def value_init(key, obs_dim: int, hidden: int):
    """State-value network (the reference carries an unused ValueNetwork,
    UNI/sac_cbf_clf/model.py:20-34; provided for API completeness)."""
    return mlp_init(key, [obs_dim, hidden, hidden, 1])


def value_apply(params, obs):
    return mlp_apply(params, obs)


def lyapunov_init(key, in_dim: int, hidden: int):
    return mlp_init(key, [in_dim, hidden, hidden, 1])


def lyapunov_apply(params, x):
    return mlp_apply(params, x)


def barrier_init(key, obs_dim: int, action_dim: int, hidden: int):
    return mlp_init(key, [obs_dim + action_dim, hidden, hidden, 1])


def barrier_apply(params, obs, action):
    xu = jnp.concatenate([obs, action], axis=-1)
    return mlp_apply(params, xu)


def soft_update(target_params, online_params, tau: float):
    """Polyak averaging: target <- tau * online + (1 - tau) * target.
    Reference: UNI/sac_cbf_clf/utils.py soft_update."""
    return jax.tree.map(lambda t, o: (1.0 - tau) * t + tau * o,
                        target_params, online_params)
