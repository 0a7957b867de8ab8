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
    if "q1" in params:
        return mlp_apply(params["q1"], xu), mlp_apply(params["q2"], xu)
    # STACKED layout (nlbac_tpu.experimental.stack_twin_q_state: one leaf
    # per layer with a leading k=2 axis; measured-loss A/B variant) —
    # one batched einsum per layer instead of two MLP applies.
    ws, bs = params["w"], params["b"]
    # first layer shares the (B, in) input across the k=2 axis without
    # materializing a broadcast copy
    x = jnp.einsum("bi,kio->kbo", xu, ws[0]) + bs[0][:, None, :]
    for i in range(1, len(ws)):
        x = jax.nn.relu(x)
        x = jnp.einsum("kbi,kio->kbo", x, ws[i]) + bs[i][:, None, :]
    return x[0], x[1]


def twin_q_unstack(params):
    """Stacked -> plain {'q1','q2'} layout (reference-layout weight
    export)."""
    if "q1" in params:
        return params
    return {"q1": {"w": [w[0] for w in params["w"]],
                   "b": [b[0] for b in params["b"]]},
            "q2": {"w": [w[1] for w in params["w"]],
                   "b": [b[1] for b in params["b"]]}}


def twin_q_stack(params):
    """Plain {'q1','q2'} -> stacked layout (weight import under
    nlbac_tpu.experimental.stack_twin_q_state)."""
    if "q1" not in params:
        return params
    q1, q2 = params["q1"], params["q2"]
    return {"w": [jnp.stack([w1, w2]) for w1, w2 in zip(q1["w"], q2["w"])],
            "b": [jnp.stack([b1, b2]) for b1, b2 in zip(q1["b"], q2["b"])]}


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
