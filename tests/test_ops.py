"""Pallas fused NODE kernel tests (interpret mode on CPU): numerics vs the
pure-JAX reference path, gradients, and the config routing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlbac_tpu.config import NodeConfig
from nlbac_tpu.nn import make_field, node_init, pack_input, \
    predict_next_state
from nlbac_tpu.ops import fused_euler_step


@pytest.mark.parametrize("n_s,n_u", [(3, 2), (6, 2)])
def test_fused_kernel_matches_reference(n_s, n_u):
    cfg = NodeConfig(form="control_affine", state_dim=n_s, action_dim=n_u,
                     hidden_dim=100)
    params = node_init(jax.random.PRNGKey(0), cfg)
    field = make_field(cfg)
    B = 300  # non-multiple of the 256 tile: exercises padding
    x = jax.random.normal(jax.random.PRNGKey(1), (B, n_s))
    u = jax.random.normal(jax.random.PRNGKey(2), (B, n_u))
    dt = 0.02

    ref = pack_input(cfg, x, u)
    ref = (ref + dt * field(params, 0.0, ref))[:, :n_s]
    got = fused_euler_step(cfg, params, x, u, dt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_kernel_gradients_match():
    cfg = NodeConfig(form="control_affine", state_dim=3, action_dim=2,
                     hidden_dim=32, f_hidden_layers=2, g_hidden_layers=2)
    params = node_init(jax.random.PRNGKey(0), cfg)
    field = make_field(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    u = jax.random.normal(jax.random.PRNGKey(2), (16, 2))

    def loss_fused(p, uu):
        return jnp.sum(jnp.square(fused_euler_step(cfg, p, x, uu, 0.02)))

    def loss_ref(p, uu):
        s = pack_input(cfg, x, uu)
        out = (s + 0.02 * field(p, 0.0, s))[:, :3]
        return jnp.sum(jnp.square(out))

    g1 = jax.grad(loss_fused, argnums=(0, 1))(params, u)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, u)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_use_pallas_config_routing():
    cfg = NodeConfig(form="control_affine", state_dim=3, action_dim=2,
                     hidden_dim=16, f_hidden_layers=1, g_hidden_layers=1,
                     use_pallas=True)
    params = node_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    u = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
    out = predict_next_state(cfg, params, x, u, 0.02)
    cfg_off = dataclasses.replace(cfg, use_pallas=False)
    ref = predict_next_state(cfg_off, params, x, u, 0.02)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
