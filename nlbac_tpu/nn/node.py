"""Neural-ODE vector fields and the one-step dynamics fit.

Two field families, selected by config (SURVEY.md §2.2):

- ``control_affine``: dx/dt = f(x) + g(x) u with two MLPs — a 4-hidden-layer
  f_net and a 3-hidden-layer g_net of width 100
  (UNI/sac_cbf_clf/model.py:177-217, dims (3,3,6);
  PVTOL/sac_cbf_clf/model.py, dims (6,6,12)).
- ``mlp``: non-affine dx/dt = F(x, u, t), single width-64 MLP over the
  concatenated (state, action, time) vector
  (CARS/sac_cbf_clf/model.py:178-205, 12 -> 10).

The integration state is ``concat(x, u[, t])`` with the field returning
zeros for the control (and time) slots — zero-order-hold control, exactly
as the reference packs its odeint input (UNI/sac_cbf_clf/model.py:208-217).

``node_train_step`` performs the reference's online fit: one MSE step
through a single Euler step over [0, dt]
(UNI/sac_cbf_clf/model.py:221-260).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from nlbac_tpu.config import NodeConfig
from nlbac_tpu.nn.mlp import mlp_apply, mlp_init, mlp_sizes
from nlbac_tpu.ode import solvers


def node_init(key, cfg: NodeConfig):
    if cfg.form == "control_affine":
        kf, kg = jax.random.split(key)
        f_sizes = mlp_sizes(cfg.state_dim, cfg.hidden_dim,
                            cfg.f_hidden_layers, cfg.state_dim)
        g_sizes = mlp_sizes(cfg.state_dim, cfg.hidden_dim,
                            cfg.g_hidden_layers,
                            cfg.state_dim * cfg.action_dim)
        return {"f": mlp_init(kf, f_sizes), "g": mlp_init(kg, g_sizes)}
    if cfg.form == "mlp":
        sizes = mlp_sizes(cfg.input_dim, cfg.hidden_dim,
                          cfg.mlp_hidden_layers, cfg.state_dim)
        return {"net": mlp_init(key, sizes)}
    raise ValueError(f"unknown NODE form {cfg.form!r}")


def make_field(cfg: NodeConfig):
    """Build ``field(params, t, s)`` over the packed state s = [x, u(, t)].

    The returned derivative has zeros in the control/time slots so the same
    packed vector integrates under any solver (ZOH control).
    """
    n_s, n_u = cfg.state_dim, cfg.action_dim
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    if cfg.form == "control_affine":
        # reject option combinations this form does not implement —
        # silently ignoring normalize (or crashing deep in the solver
        # on the missing time slot) corrupts/confuses the experiment
        if cfg.normalize:
            raise ValueError(
                "normalize=True is only implemented for form='mlp' "
                "(the quadrotor normalized non-affine form, README.md:"
                "194-195); the control-affine field would silently "
                "ignore it")
        if cfg.time_input:
            raise ValueError(
                "time_input=True is only implemented for form='mlp' "
                "(the cars time-input form); the control-affine field "
                "does not carry a time slot")

        def field(params, t, s):
            x = s[..., :n_s]
            u = s[..., n_s:n_s + n_u]
            f_x = mlp_apply(params["f"], x, compute_dtype=cdt)
            g_x = mlp_apply(params["g"], x, compute_dtype=cdt)
            g_x = g_x.reshape(g_x.shape[:-1] + (n_s, n_u))
            dx = f_x + jnp.einsum("...ij,...j->...i", g_x, u)
            return jnp.concatenate([dx, jnp.zeros_like(u)], axis=-1)

        return field

    if cfg.form == "mlp":
        if cfg.normalize:
            # Quadrotor form: normalized inputs, denormalized outputs
            # (reference README.md:194-195)
            if cfg.state_scale is None or cfg.action_scale is None:
                raise ValueError(
                    "normalize=True requires state_scale and "
                    "action_scale (per-dimension scales; see the "
                    "quadrotor preset) — both are None")
            sx = jnp.asarray(cfg.state_scale, jnp.float32)
            su = jnp.asarray(cfg.action_scale, jnp.float32)
            extra = jnp.ones((1,), jnp.float32) if cfg.time_input else \
                jnp.zeros((0,), jnp.float32)
            scale_in = jnp.concatenate([sx, su, extra])

            def field(params, t, s):
                dx = mlp_apply(params["net"], s / scale_in,
                               compute_dtype=cdt) * sx
                tail = s[..., n_s:]
                return jnp.concatenate([dx, jnp.zeros_like(tail)],
                                       axis=-1)

            return field

        def field(params, t, s):
            dx = mlp_apply(params["net"], s, compute_dtype=cdt)
            tail = s[..., n_s:]
            return jnp.concatenate([dx, jnp.zeros_like(tail)], axis=-1)

        return field

    raise ValueError(f"unknown NODE form {cfg.form!r}")


def pack_input(cfg: NodeConfig, x, u, t=None):
    """Pack (state, action[, time]) into the integration state."""
    parts = [x, u]
    if cfg.time_input:
        if t is None:
            raise ValueError("this NODE form requires a time input")
        parts.append(t if t.ndim == x.ndim else t[..., None])
    return jnp.concatenate(parts, axis=-1)


def predict_next_state(cfg: NodeConfig, params, x, u, dt, t=None,
                       field=None):
    """One model rollout step: integrate the packed state over [0, dt] and
    return the predicted next physical state (first state_dim slots).

    Mirrors ``odeint(model, [x,u], [0,dt], method)[-1][:, :n_s]`` in the
    reference (UNI/sac_cbf_clf/sac_cbf_clf.py:449-455).

    Deliberately XLA-only: a hand-written Pallas fusion of this step was
    built and measured in rounds 1-2 and LOST end-to-end (1030 vs 1201
    steps/s) because ``pallas_call`` is a fusion barrier inside the fused
    episode program — see DESIGN.md §3 for the numbers."""
    if field is None:
        field = make_field(cfg)
    s0 = pack_input(cfg, x, u, t)
    if cfg.solver == "dopri5":
        if getattr(cfg, "adaptive_impl", "while") == "scan":
            # Fixed-trip-count masked-acceptance dopri5 (solve_adaptive
            # impl='scan'): directly reverse-differentiable through the
            # scan (discretize-then-optimize) and free of data-dependent
            # loops, so it nests inside the fused episode program on the
            # axon backend where the while_loop variant crashes the
            # remote compiler (PARITY "NODE solver stack").
            s1 = solvers.odeint(field, params, s0, 0.0, dt,
                                method="dopri5", impl="scan",
                                max_steps=cfg.adaptive_scan_steps)
        else:
            # The while_loop adaptive solver is not reverse-mode
            # differentiable — and this function sits on every gradient
            # path (NODE fit, constraint rollouts).  Route through the
            # adjoint (same forward values; backsolve VJP), which is
            # also how torchdiffeq trains through dopri5.
            from nlbac_tpu.ode import odeint_adjoint

            s1 = odeint_adjoint(field, params, s0, 0.0, dt,
                                method="dopri5")
    else:
        s1 = solvers.odeint(field, params, s0, 0.0, dt, method=cfg.solver,
                            num_steps=cfg.solver_steps)
    return s1[..., :cfg.state_dim]


def node_loss(cfg: NodeConfig, params, x, u, x_next, dt, t=None, field=None):
    """Mean-squared one-step prediction error (the reference's PoseLoss)."""
    pred = predict_next_state(cfg, params, x, u, dt, t, field)
    return jnp.mean(jnp.square(pred - x_next))


def node_train_step(cfg: NodeConfig, params, opt_state, optimizer, x, u,
                    x_next, dt, t=None, field=None
                    ) -> Tuple[dict, tuple, jnp.ndarray]:
    """One Adam step on the one-step MSE.

    Reference: model.py train_step — zero_grad, odeint euler over [0,dt],
    MSE vs observed next state, Adam(1e-3) step."""
    loss, grads = jax.value_and_grad(
        lambda p: node_loss(cfg, p, x, u, x_next, dt, t, field))(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
