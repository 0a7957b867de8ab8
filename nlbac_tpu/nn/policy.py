"""Policies: tanh-squashed Gaussian (reparameterized) and deterministic.

Parity anchors (UNI/sac_cbf_clf/model.py):
- GaussianPolicy: 2x hidden trunk + mean/log_std heads, log_std clamped to
  [-20, 2] (model.py:7-8,108-114); sample() draws x ~ N(mean, std), squashes
  y = tanh(x), rescales a = y*scale + bias, and corrects the log-prob with
  -log(scale * (1 - y^2) + 1e-6) summed over action dims (model.py:116-128).
- DeterministicPolicy: tanh(mean)*scale + bias with clipped N(0, 0.1) noise
  (model.py:136-168).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nlbac_tpu.nn.mlp import mlp_apply, mlp_init, xavier_uniform

LOG_SIG_MAX = 2.0
LOG_SIG_MIN = -20.0
EPS = 1e-6


class ActionSpec(NamedTuple):
    """Affine map from tanh-space to env action space."""

    scale: jnp.ndarray  # (action_dim,) = (high - low) / 2
    bias: jnp.ndarray  # (action_dim,) = (high + low) / 2

    @staticmethod
    def from_bounds(low, high) -> "ActionSpec":
        low = jnp.asarray(low, jnp.float32)
        high = jnp.asarray(high, jnp.float32)
        return ActionSpec(scale=(high - low) / 2.0, bias=(high + low) / 2.0)


def gaussian_policy_init(key, obs_dim: int, action_dim: int, hidden: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "trunk": mlp_init(k1, [obs_dim, hidden, hidden]),
        "mean": {"w": [xavier_uniform(k2, (hidden, action_dim))],
                 "b": [jnp.zeros((action_dim,), jnp.float32)]},
        "log_std": {"w": [xavier_uniform(k3, (hidden, action_dim))],
                    "b": [jnp.zeros((action_dim,), jnp.float32)]},
    }


def gaussian_policy_forward(params, obs):
    """Returns (mean, log_std) with log_std clamped."""
    h = mlp_apply(params["trunk"], obs, final_activation=jax.nn.relu)
    mean = h @ params["mean"]["w"][0] + params["mean"]["b"][0]
    log_std = h @ params["log_std"]["w"][0] + params["log_std"]["b"][0]
    log_std = jnp.clip(log_std, LOG_SIG_MIN, LOG_SIG_MAX)
    return mean, log_std


def gaussian_policy_sample(params, obs, key, spec: ActionSpec
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reparameterized sample.

    Returns (action, log_prob (B,1), deterministic_action), matching the
    reference's ``policy.sample`` triple."""
    mean, log_std = gaussian_policy_forward(params, obs)
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    x = mean + std * noise
    y = jnp.tanh(x)
    action = y * spec.scale + spec.bias
    # Normal log-prob + tanh-squash correction
    log_prob = (-0.5 * jnp.square(noise) - log_std
                - 0.5 * jnp.log(2.0 * jnp.pi))
    log_prob = log_prob - jnp.log(spec.scale * (1.0 - jnp.square(y)) + EPS)
    log_prob = jnp.sum(log_prob, axis=-1, keepdims=True)
    det_action = jnp.tanh(mean) * spec.scale + spec.bias
    return action, log_prob, det_action


def deterministic_policy_init(key, obs_dim: int, action_dim: int,
                              hidden: int):
    return mlp_init(key, [obs_dim, hidden, hidden, action_dim])


def deterministic_policy_sample(params, obs, key, spec: ActionSpec,
                                noise_std: float = 0.1,
                                noise_clip: float = 0.25):
    mean = mlp_apply(params, obs)
    mean = jnp.tanh(mean) * spec.scale + spec.bias
    noise = jnp.clip(noise_std * jax.random.normal(key, mean.shape),
                     -noise_clip, noise_clip)
    return mean + noise, jnp.zeros(mean.shape[:-1] + (1,)), mean
