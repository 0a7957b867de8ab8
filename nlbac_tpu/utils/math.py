"""Small math utilities.

Capability parity with UNI/sac_cbf_clf/utils.py:14-165: action scaling
between [-1,1] and env bounds, 2-D rotation helpers, and angle
normalization (the color prints live in train/logging.colorize; the
torch tensor shims are unnecessary in a functional stack).
"""

from __future__ import annotations

import jax.numpy as jnp


def scale_action(action, low, high):
    """[-1, 1] -> [low, high]."""
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)
    return low + 0.5 * (action + 1.0) * (high - low)


def unscale_action(action, low, high):
    """[low, high] -> [-1, 1]."""
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)
    return 2.0 * (action - low) / (high - low) - 1.0


def rot_2d(theta):
    """World->body 2-D rotation matrices for a batch of angles:
    (..., ) -> (..., 2, 2)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    row0 = jnp.stack([c, s], axis=-1)
    row1 = jnp.stack([-s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rotate(vec, theta):
    """Rotate (..., 2) vectors into the body frame of angle theta."""
    return jnp.einsum("...ij,...j->...i", rot_2d(theta), vec)


def wrap_angle(theta):
    """Wrap angles to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))
