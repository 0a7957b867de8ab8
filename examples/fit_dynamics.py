#!/usr/bin/env python
"""Fit a neural-ODE dynamics model to trajectories — the solver stack
and NODE model used standalone, outside the RL loop.

Generates one-step transitions from a damped pendulum with torque
control, then fits the control-affine NODE (x_dot = f(x) + g(x) u, the
same form the unicycle/pvtol presets learn online) by one-step MSE —
the reference's torchdiffeq `train_step` capability
(UNI/sac_cbf_clf/model.py:221-260) on the jax solver stack.

Run from the repo root:
    python examples/fit_dynamics.py [--cpu]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the
                                  # axon plugin registration; CLAUDE.md)

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import optax

from nlbac_tpu.config import NodeConfig
from nlbac_tpu.nn import make_field, node_init, node_train_step
from nlbac_tpu.ode import odeint

DT = 0.02


def pendulum(params, t, state_u):
    """True dynamics as an ode field: state = [theta, omega], u = torque."""
    del params, t
    theta, omega, u = state_u[..., 0], state_u[..., 1], state_u[..., 2]
    return jnp.stack([omega, -9.8 * jnp.sin(theta) - 0.1 * omega + u,
                      jnp.zeros_like(u)], axis=-1)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    # one-step transitions (x, u) -> x_next via rk4 on the true field
    n = 4096
    x = jax.random.uniform(k1, (n, 2), minval=-2.0, maxval=2.0)
    u = jax.random.uniform(k2, (n, 1), minval=-3.0, maxval=3.0)
    xu = jnp.concatenate([x, u], axis=-1)
    x_next = odeint(pendulum, None, xu, 0.0, DT, method="rk4",
                    num_steps=4)[..., :2]

    cfg = NodeConfig(form="control_affine", state_dim=2, action_dim=1,
                     hidden_dim=64, solver="euler")
    params = node_init(jax.random.PRNGKey(1), cfg)
    field = make_field(cfg)
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)

    step = jax.jit(lambda p, o, xx, uu, xn: node_train_step(
        cfg, p, o, opt, xx, uu, xn, DT, field=field))
    for i in range(401):
        params, opt_state, loss = step(params, opt_state, x, u, x_next)
        if i % 100 == 0:
            print(f"step {i:4d}: one-step MSE {float(loss):.3e}")
    assert float(loss) < 1e-4, "fit did not converge"
    print("fitted: the learned field predicts one-step pendulum "
          "transitions to < 1e-4 MSE")


if __name__ == "__main__":
    main()
