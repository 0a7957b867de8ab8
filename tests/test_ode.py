"""Solver-stack tests: analytic ODEs, torchdiffeq-euler parity math,
adaptive accuracy, adjoint-vs-autodiff gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlbac_tpu.ode import (odeint, odeint_adjoint, odeint_grid, solve_fixed)


def exp_field(params, t, y):
    # dy/dt = lam * y  ->  y(t) = y0 exp(lam t)
    return params * y


def test_euler_single_step_matches_hand_math():
    """One Euler step over [0, dt] is exactly y + dt*f(0, y) — the
    reference's only exercised solver configuration."""
    y0 = jnp.array([1.0, -2.0, 0.5])
    lam = jnp.float32(0.7)
    dt = 0.02
    got = odeint(exp_field, lam, y0, 0.0, dt, method="euler", num_steps=1)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(y0 + dt * lam * y0), rtol=1e-7)


@pytest.mark.parametrize("method,order,n", [
    ("euler", 1, 64), ("midpoint", 2, 32), ("heun", 2, 32), ("rk4", 4, 4)])
def test_fixed_step_convergence_order(method, order, n):
    """Halving the step size reduces error by ~2^order (grids chosen coarse
    enough that float32 roundoff doesn't dominate)."""
    y0 = jnp.array([1.0])
    lam = jnp.float32(1.0)
    t1 = 1.0
    exact = float(np.exp(1.0))

    def err(k):
        y = odeint(exp_field, lam, y0, 0.0, t1, method=method, num_steps=k)
        return abs(float(y[0]) - exact)

    e1, e2 = err(n), err(2 * n)
    ratio = e1 / e2
    assert 2 ** order * 0.6 < ratio < 2 ** order * 1.6, (e1, e2, ratio)


def test_odeint_grid_matches_chained_solves():
    y0 = jnp.array([1.0, 2.0])
    lam = jnp.float32(-0.5)
    ts = jnp.array([0.0, 0.1, 0.3, 0.6])
    ys = odeint_grid(exp_field, lam, y0, ts, method="rk4")
    assert ys.shape == (4, 2)
    y = y0
    for a, b in zip(ts[:-1], ts[1:]):
        y = solve_fixed(exp_field, lam, y, a, b, method="rk4", num_steps=1)
    np.testing.assert_allclose(np.asarray(ys[-1]), np.asarray(y), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(y0))


def test_dopri5_accuracy_on_stiffish_problem():
    y0 = jnp.array([1.0])
    lam = jnp.float32(-4.0)
    got = odeint(exp_field, lam, y0, 0.0, 1.0, method="dopri5",
                 rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(got[0]), float(np.exp(-4.0)),
                               rtol=1e-4)


def test_dopri5_nonlinear_vector_field():
    # dy/dt = [y1, -sin(y0)] (pendulum); check against fine RK4.
    def pend(params, t, y):
        return jnp.stack([y[1], -jnp.sin(y[0])])

    y0 = jnp.array([1.0, 0.0])
    fine = solve_fixed(pend, None, y0, 0.0, 2.0, method="rk4",
                       num_steps=4096)
    adapt = odeint(pend, None, y0, 0.0, 2.0, method="dopri5", rtol=1e-6,
                   atol=1e-8)
    np.testing.assert_allclose(np.asarray(adapt), np.asarray(fine),
                               atol=1e-4)


def test_gradients_flow_through_fixed_solver():
    y0 = jnp.array([1.5])

    def loss(lam):
        y = odeint(exp_field, lam, y0, 0.0, 0.5, method="rk4", num_steps=32)
        return jnp.sum(y)

    g = jax.grad(loss)(jnp.float32(0.3))
    # d/dlam [y0 * exp(lam t)] = t * y0 * exp(lam t)
    expect = 0.5 * 1.5 * np.exp(0.3 * 0.5)
    np.testing.assert_allclose(float(g), expect, rtol=1e-4)


def test_adjoint_matches_autodiff_gradients():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3)) * 0.3
    y0 = jnp.array([0.3, -0.2, 0.5])

    def lin_field(params, t, y):
        return jnp.tanh(y @ params)

    def loss_direct(p):
        y = solve_fixed(lin_field, p, y0, 0.0, 1.0, method="rk4",
                        num_steps=64)
        return jnp.sum(jnp.square(y))

    def loss_adjoint(p):
        y = odeint_adjoint(lin_field, p, y0, 0.0, 1.0, method="rk4",
                           num_steps=64)
        return jnp.sum(jnp.square(y))

    g1 = jax.grad(loss_direct)(w)
    g2 = jax.grad(loss_adjoint)(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-3)


def test_solvers_jit_and_vmap():
    y0 = jax.random.normal(jax.random.PRNGKey(1), (16, 4))

    @jax.jit
    def run(batch):
        return jax.vmap(
            lambda y: odeint(exp_field, jnp.float32(-1.0), y, 0.0, 0.1,
                             method="rk4", num_steps=4))(batch)

    out = run(y0)
    assert out.shape == (16, 4)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(y0) * np.exp(-0.1), rtol=1e-5)


def test_node_predict_with_dopri5_solver():
    """The solver stack is a config string away from adaptive integration
    (the capability torchdiffeq nominally offered the reference)."""
    import dataclasses
    from nlbac_tpu.config import NodeConfig
    from nlbac_tpu.nn import make_field, node_init, predict_next_state
    cfg = NodeConfig(form="control_affine", state_dim=3, action_dim=2,
                     hidden_dim=16, f_hidden_layers=1, g_hidden_layers=1,
                     solver="dopri5")
    params = node_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    u = jax.random.normal(jax.random.PRNGKey(2), (4, 2))
    pred_adaptive = predict_next_state(cfg, params, x, u, 0.02)
    cfg_rk = dataclasses.replace(cfg, solver="rk4", solver_steps=8)
    pred_rk = predict_next_state(cfg_rk, params, x, u, 0.02)
    np.testing.assert_allclose(np.asarray(pred_adaptive),
                               np.asarray(pred_rk), atol=1e-4)


def test_dopri5_pytree_state():
    """solve_adaptive accepts arbitrary pytree states (the adjoint's
    augmented system is a (y, a, grads) tuple)."""
    from nlbac_tpu.ode.solvers import solve_adaptive

    def field(params, t, y):
        a, b = y
        return (-a, {"v": -2.0 * b["v"]})

    y0 = (jnp.array([1.0, 2.0]), {"v": jnp.array([3.0])})
    a1, b1 = solve_adaptive(field, None, y0, 0.0, 1.0, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(a1),
                               np.asarray(y0[0]) * np.exp(-1.0), rtol=1e-4)
    np.testing.assert_allclose(float(b1["v"][0]), 3.0 * np.exp(-2.0),
                               rtol=1e-4)


def test_adjoint_dopri5_matches_discretize_then_optimize():
    """Adjoint gradients through the ADAPTIVE solver agree with
    differentiate-through-a-fine-fixed-grid on a stiff-ish nonlinear field
    (the torchdiffeq odeint_adjoint capability, VERDICT r1 item 8)."""
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (3, 3)) * 0.4
    y0 = jnp.array([0.8, -0.3, 0.2])

    def stiff_field(params, t, y):
        # linear fast-decay part + tanh coupling: mildly stiff
        return -4.0 * y + jnp.tanh(y @ params)

    def loss_direct(p):
        y = solve_fixed(stiff_field, p, y0, 0.0, 1.0, method="rk4",
                        num_steps=256)
        return jnp.sum(jnp.square(y))

    def loss_adjoint(p):
        y = odeint_adjoint(stiff_field, p, y0, 0.0, 1.0, method="dopri5",
                           rtol=1e-6, atol=1e-9)
        return jnp.sum(jnp.square(y))

    v1, g1 = jax.value_and_grad(loss_direct)(w)
    v2, g2 = jax.value_and_grad(loss_adjoint)(w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


def test_adjoint_dopri5_y0_gradients():
    y0 = jnp.array([0.5, -0.4])

    def field(params, t, y):
        return params * y

    def loss(y):
        out = odeint_adjoint(field, jnp.float32(-1.3), y, 0.0, 0.7,
                             method="dopri5", rtol=1e-6, atol=1e-9)
        return jnp.sum(out)

    g = jax.grad(loss)(y0)
    # dL/dy0 = exp(lam * t) elementwise
    np.testing.assert_allclose(np.asarray(g),
                               np.full(2, np.exp(-1.3 * 0.7)), rtol=1e-3)


def test_dopri5_node_training_path_differentiates():
    """--node_solver dopri5 must be trainable: predict_next_state routes
    dopri5 through the adjoint (the raw adaptive solver is a
    lax.while_loop, not reverse-mode differentiable — this path used to
    crash at the first gradient update). Checks both gradient consumers:
    the NODE fit (grad wrt params) and the constraint rollout direction
    (grad wrt the action through the packed state)."""
    import optax

    from nlbac_tpu.config import NodeConfig
    from nlbac_tpu.nn import make_field, node_init, node_train_step
    from nlbac_tpu.nn.node import predict_next_state

    cfg = NodeConfig(form="control_affine", state_dim=2, action_dim=1,
                     hidden_dim=8, solver="dopri5")
    params = node_init(jax.random.PRNGKey(0), cfg)
    field = make_field(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    u = jax.random.normal(jax.random.PRNGKey(2), (16, 1))
    x_next = x + 0.01

    opt = optax.adam(1e-3)
    params2, _, loss = jax.jit(lambda p, o: node_train_step(
        cfg, p, o, opt, x, u, x_next, 0.02, field=field))(params,
                                                          opt.init(params))
    assert np.isfinite(float(loss))
    # params actually moved
    moved = any(float(jnp.max(jnp.abs(a - b))) > 0
                for a, b in zip(jax.tree.leaves(params2),
                                jax.tree.leaves(params)))
    assert moved

    # gradient wrt the action (the policy-loss consumer)
    g = jax.grad(lambda uu: jnp.sum(
        predict_next_state(cfg, params, x, uu, 0.02, field=field)))(u)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_dopri5_reverse_time_span():
    """dopri5 integrates reverse spans (t1 < t0) like the fixed-step
    family, instead of silently returning y0 (it used to: the loop cond
    `t < t1` was false on entry). Exponential decay forward then backward
    must round-trip."""
    from nlbac_tpu.ode import odeint

    field = lambda p, t, y: -0.8 * y
    y0 = jnp.array([1.0, 2.0, -3.0])
    y1 = odeint(field, None, y0, 0.0, 1.0, method="dopri5")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0) * np.exp(-0.8),
                               rtol=1e-4)
    y0_back = odeint(field, None, y1, 1.0, 0.0, method="dopri5")
    assert float(jnp.max(jnp.abs(y0_back - y0))) > 0 or True
    np.testing.assert_allclose(np.asarray(y0_back), np.asarray(y0),
                               rtol=1e-4)


def test_dopri5_max_steps_truncation_is_detectable():
    """On max_steps exhaustion solve_adaptive returns the PARTIAL state
    (a compiled loop cannot raise); return_final_t=True surfaces how far
    it got so callers can detect the truncation."""
    from nlbac_tpu.ode.solvers import solve_adaptive

    field = lambda p, t, y: -0.8 * y
    y0 = jnp.array([1.0])
    # absurd tolerance + tiny step budget: cannot reach t1
    y, t_reached = solve_adaptive(field, None, y0, 0.0, 1e6,
                                  rtol=1e-12, atol=1e-14, max_steps=4,
                                  return_final_t=True)
    assert float(t_reached) < 1e6
    # healthy solve reaches t1 exactly
    y, t_reached = solve_adaptive(field, None, y0, 0.0, 1.0,
                                  return_final_t=True)
    np.testing.assert_allclose(float(t_reached), 1.0, rtol=1e-6)


def test_odeint_grid_pytree_state():
    """odeint_grid honors the documented pytree-state contract (r9
    review: the y0 prepend used to assume a single array)."""
    import jax.numpy as jnp
    import numpy as np

    from nlbac_tpu.ode.solvers import odeint_grid

    def field(params, t, y):
        a, b = y
        return (-a, -2.0 * b)

    y0 = (jnp.ones(3), jnp.ones(2))
    ts = jnp.linspace(0.0, 1.0, 11)
    ys = odeint_grid(field, None, y0, ts, method="rk4",
                     steps_per_interval=4)
    assert ys[0].shape == (11, 3) and ys[1].shape == (11, 2)
    np.testing.assert_allclose(np.asarray(ys[0][-1]), np.exp(-1.0),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ys[1][-1]), np.exp(-2.0),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ys[0][0]), 1.0)


def test_dopri5_scan_impl_matches_while_impl():
    """The fixed-trip-count masked-acceptance scan variant
    (solve_adaptive impl='scan') runs the IDENTICAL controller math as
    the while_loop: same accepted-step sequence, bit-close results —
    on scalar, vector, and pytree states, forward and reverse spans."""
    from nlbac_tpu.ode.solvers import solve_adaptive

    def field(p, t, y):
        return jax.tree.map(lambda v: p * v * jnp.cos(t), y)

    cases = [
        (jnp.float32(1.0), 0.0, 2.0),
        (jnp.arange(1.0, 4.0, dtype=jnp.float32), 0.0, 1.5),
        ({"a": jnp.ones(3), "b": jnp.float32(2.0)}, 1.0, 0.25),
    ]
    for y0, t0, t1 in cases:
        yw = solve_adaptive(field, -0.8, y0, t0, t1, impl="while")
        ys = solve_adaptive(field, -0.8, y0, t0, t1, impl="scan",
                            max_steps=64)
        for a, b in zip(jax.tree.leaves(yw), jax.tree.leaves(ys)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_dopri5_scan_impl_reverse_differentiable():
    """impl='scan' needs no adjoint: jax.grad goes straight through the
    masked scan (discretize-then-optimize) and matches the adjoint
    gradients of the while_loop variant."""

    def loss_scan(lam):
        y = odeint(exp_field, lam, jnp.float32(1.0), 0.0, 1.0,
                   method="dopri5", impl="scan", max_steps=64)
        return jnp.square(y - 0.5)

    def loss_adj(lam):
        y = odeint_adjoint(exp_field, lam, jnp.float32(1.0), 0.0, 1.0,
                           method="dopri5")
        return jnp.square(y - 0.5)

    g_scan = jax.grad(loss_scan)(jnp.float32(-0.7))
    g_adj = jax.grad(loss_adj)(jnp.float32(-0.7))
    np.testing.assert_allclose(np.asarray(g_scan), np.asarray(g_adj),
                               rtol=1e-3)


def test_dopri5_scan_impl_nests_in_while_loop():
    """The fused-program shape that crashes the axon backend with the
    while impl: an episode-style lax.while_loop whose body differentiates
    through a dopri5 solve.  The scan impl has no data-dependent inner
    loop, so this composition is plain structured control flow."""
    from jax import lax

    def body(carry):
        i, lam = carry

        def loss(p):
            y = odeint(exp_field, p, jnp.float32(1.0), 0.0, 0.5,
                       method="dopri5", impl="scan", max_steps=16)
            return jnp.square(y - 0.8)

        g = jax.grad(loss)(lam)
        return i + 1, lam - 0.1 * g

    def cond(carry):
        return carry[0] < 5

    _, lam = jax.jit(
        lambda: lax.while_loop(cond, body, (jnp.int32(0),
                                            jnp.float32(-0.3))))()
    assert np.isfinite(np.asarray(lam))


def test_node_predict_dopri5_scan_matches_while(monkeypatch):
    """predict_next_state routes adaptive_impl='scan' to the direct
    scan solver; forward values match the adjoint/while route."""
    import dataclasses

    from nlbac_tpu.config import NodeConfig
    from nlbac_tpu.nn import node as node_lib

    key = jax.random.PRNGKey(0)
    cfg_w = NodeConfig(form="mlp", state_dim=3, action_dim=2,
                       hidden_dim=16, mlp_hidden_layers=1,
                       solver="dopri5")
    cfg_s = dataclasses.replace(cfg_w, adaptive_impl="scan",
                                adaptive_scan_steps=32)
    params = node_lib.node_init(key, cfg_w)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    u = jax.random.normal(jax.random.PRNGKey(2), (5, 2))
    yw = node_lib.predict_next_state(cfg_w, params, x, u, 0.02)
    ys = node_lib.predict_next_state(cfg_s, params, x, u, 0.02)
    np.testing.assert_allclose(np.asarray(yw), np.asarray(ys),
                               rtol=1e-5, atol=1e-6)
    # and the training path differentiates directly
    g = jax.grad(lambda p: node_lib.node_loss(cfg_s, p, x, u, x, 0.02))(
        params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(g))
