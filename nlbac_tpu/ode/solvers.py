"""ODE solver stack: fixed-step explicit RK methods on ``lax.scan`` plus an
adaptive Dormand-Prince (dopri5) solver with a PI step controller.

This replaces the reference's torchdiffeq dependency.  Parity anchor: the
reference always calls ``odeint(field, y0, [0, dt], method='euler')``
(UNI/sac_cbf_clf/sac_cbf_clf.py:450-454, model.py:251-253), which for a
fixed-step method performs exactly ONE explicit Euler step over the span —
``euler_step`` here bit-matches that math (the atol/rtol arguments the
reference passes are inert for fixed-step methods).  The adaptive path
(dopri5) is a capability of the dependency the reference never exercises;
we provide it as a first-class solver.

All solvers are pure functions of ``(field, params, y0, ...)`` where
``field(params, t, y) -> dy/dt``, accept arbitrary PYTREE states (needed
by the adjoint's augmented system), and are jit/vmap-compatible.  The
fixed-step family is also reverse-mode differentiable in place
(discretize-then-optimize autodiff through the ``lax.scan``); dopri5 is a
``lax.while_loop`` and therefore NOT reverse-mode differentiable directly
— differentiate through it with :func:`nlbac_tpu.ode.odeint_adjoint`
(optimize-then-discretize backsolve; ``nn.predict_next_state`` routes
``solver='dopri5'`` there automatically).  On ``max_steps`` exhaustion
the adaptive solver returns the partially-integrated state (a compiled
loop cannot raise) — see :func:`solve_adaptive` for how to detect it.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Field = Callable  # field(params, t, y) -> dy/dt


def _axpy(a, x, y):
    """Pytree y + a * x."""
    return jax.tree.map(lambda xi, yi: yi + a * xi, x, y)


def _comb(y, dt, pairs):
    """Pytree y + dt * sum(w * k for w, k in pairs)."""
    out = y
    for w, k in pairs:
        out = _axpy(dt * w, k, out)
    return out


# ---------------------------------------------------------------------------
# Fixed-step explicit Runge-Kutta steps (pytree-state capable)
# ---------------------------------------------------------------------------

def euler_step(field: Field, params, t, y, dt):
    """One explicit Euler step: y + dt * f(t, y).

    Matches torchdiffeq's ``method='euler'`` over a single grid interval
    (the reference's only exercised solver configuration)."""
    return _axpy(dt, field(params, t, y), y)


def midpoint_step(field: Field, params, t, y, dt):
    k1 = field(params, t, y)
    k2 = field(params, t + 0.5 * dt, _axpy(0.5 * dt, k1, y))
    return _axpy(dt, k2, y)


def heun_step(field: Field, params, t, y, dt):
    k1 = field(params, t, y)
    k2 = field(params, t + dt, _axpy(dt, k1, y))
    return _comb(y, dt, [(0.5, k1), (0.5, k2)])


def rk4_step(field: Field, params, t, y, dt):
    k1 = field(params, t, y)
    k2 = field(params, t + 0.5 * dt, _axpy(0.5 * dt, k1, y))
    k3 = field(params, t + 0.5 * dt, _axpy(0.5 * dt, k2, y))
    k4 = field(params, t + dt, _axpy(dt, k3, y))
    return _comb(y, dt, [(1 / 6, k1), (1 / 3, k2), (1 / 3, k3), (1 / 6, k4)])


_FIXED_STEPS = {
    "euler": euler_step,
    "midpoint": midpoint_step,
    "heun": heun_step,
    "rk4": rk4_step,
}


def solve_fixed(field: Field, params, y0, t0, t1, *, method: str = "euler",
                num_steps: int = 1):
    """Integrate from t0 to t1 with ``num_steps`` equal fixed steps.

    ``num_steps`` is static; the loop compiles to a single ``lax.scan`` so a
    longer horizon is one fused XLA loop, not a Python chain.
    """
    step_fn = _FIXED_STEPS[method]
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)
    dt = (t1 - t0) / num_steps
    if num_steps == 1:
        # The reference's hot configuration: no scan machinery, so XLA can
        # fuse the single field eval into surrounding computation.
        return step_fn(field, params, t0, y0, dt)

    def body(carry, _):
        t, y = carry
        y = step_fn(field, params, t, y, dt)
        return (t + dt, y), None

    (_, y1), _ = lax.scan(body, (t0, y0), None, length=num_steps)
    return y1


def odeint_grid(field: Field, params, y0, ts, *, method: str = "euler",
                steps_per_interval: int = 1):
    """Integrate through an arbitrary time grid ``ts`` (shape (T,)),
    returning states stacked at each grid point (shape (T, ...)).

    Equivalent surface to ``torchdiffeq.odeint(field, y0, ts, method=...)``:
    ``out[0] == y0`` and ``out[i]`` is the solution at ``ts[i]``.
    """
    ts = jnp.asarray(ts, jnp.float32)
    step_fn = _FIXED_STEPS[method]

    def interval(y, t_pair):
        t_a, t_b = t_pair
        dt = (t_b - t_a) / steps_per_interval

        def body(carry, _):
            t, yy = carry
            yy = step_fn(field, params, t, yy, dt)
            return (t + dt, yy), None

        if steps_per_interval == 1:
            y_next = step_fn(field, params, t_a, y, dt)
        else:
            (_, y_next), _ = lax.scan(body, (t_a, y), None,
                                      length=steps_per_interval)
        return y_next, y_next

    _, ys = lax.scan(interval, y0, (ts[:-1], ts[1:]))
    # prepend y0 leaf-wise so the documented pytree-state contract holds
    # for the grid solver too (ys stacks each leaf along a new axis 0)
    return jax.tree.map(
        lambda y0_leaf, ys_leaf: jnp.concatenate(
            [y0_leaf[None], ys_leaf], axis=0), y0, ys)


# ---------------------------------------------------------------------------
# Adaptive Dormand-Prince 5(4)
# ---------------------------------------------------------------------------

# Butcher tableau (dopri5)
_DP_C = [0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0]
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
_DP_B4 = [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40]


def _dopri5_step(field: Field, params, t, y, dt):
    """One dopri5 trial step on a PYTREE state; returns
    (5th-order y, 4th-order y)."""
    ks = []
    for i in range(7):
        yi = y
        for j, a in enumerate(_DP_A[i]):
            yi = _axpy(dt * a, ks[j], yi)
        ks.append(field(params, t + _DP_C[i] * dt, yi))
    y5 = _comb(y, dt, list(zip(_DP_B5, ks)))
    y4 = _comb(y, dt, list(zip(_DP_B4, ks)))
    return y5, y4


class _AdaptState(NamedTuple):
    t: jnp.ndarray
    y: jnp.ndarray  # pytree
    dt: jnp.ndarray
    err_prev: jnp.ndarray
    n_steps: jnp.ndarray


def solve_adaptive(field: Field, params, y0, t0, t1, *, rtol: float = 1e-5,
                   atol: float = 1e-7, max_steps: int = 512,
                   safety: float = 0.9, min_factor: float = 0.2,
                   max_factor: float = 10.0, return_final_t: bool = False,
                   impl: str = "while"):
    """Adaptive dopri5 with a PI step-size controller, as a bounded
    ``lax.while_loop`` (static ``max_steps`` backstop keeps it compilable).

    ``impl='scan'`` runs the IDENTICAL controller math as a fixed-
    trip-count ``lax.scan`` with masked step acceptance: every trip
    computes a trial step, and trips after the span is reached leave the
    state untouched.  Iterates match the while_loop bit-for-bit while
    active, so results are equal whenever ``max_steps`` covers the trial
    steps actually needed — pass a realistic bound (e.g. 16-32 for the
    NODE's dt=0.02 spans), not the while-loop's 512 backstop, because
    every trip is PAID in compute.  Two reasons to choose it: (a) it is
    reverse-mode differentiable directly (discretize-then-optimize
    through the scan — no adjoint backsolve needed), and (b) it has no
    data-dependent loop, which the fused episode program needs on the
    axon TPU backend (a dopri5 while_loop nested in the episode
    while_loop reproducibly crashes the remote compiler — PARITY "NODE
    solver stack").

    The state ``y0`` may be any pytree (needed by the adjoint's augmented
    system); the error norm is the RMS over all leaf elements, matching
    torchdiffeq's ``rms_norm`` over the flattened tuple state.  Reverse
    spans (t1 < t0) integrate backward, like the fixed-step family
    (internally the solver runs forward over sigma in [0, |t1-t0|] on a
    direction-flipped field, so both directions stay fully traceable).

    If ``max_steps`` trial steps are exhausted before reaching ``t1``
    (stiff field / tolerances unreachable in f32), the PARTIAL state is
    returned — a compiled loop cannot raise the way torchdiffeq does.
    Pass ``return_final_t=True`` to get ``(y, t_reached)`` and check
    ``t_reached`` against ``t1`` when that case matters.
    """
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)
    span = jnp.abs(t1 - t0)
    direction = jnp.sign(t1 - t0)
    orig_field = field

    def field(p, s, y):  # noqa: F811 — sigma-time wrapper
        return jax.tree.map(lambda v: direction * v,
                            orig_field(p, t0 + direction * s, y))

    dt0 = span * 0.1

    def err_norm(y5, y4, y):
        def leaf_sq(a5, a4, a):
            scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(a5))
            return jnp.sum(jnp.square((a5 - a4) / scale))
        sq = jax.tree.map(leaf_sq, y5, y4, y)
        total = sum(jax.tree.leaves(sq))
        n = sum(x.size for x in jax.tree.leaves(y))
        # the max() floors sqrt away from 0 so reverse-mode through the
        # scan impl stays finite (sqrt'(0)=inf would NaN the cotangent
        # even on masked trips — 0 * inf). Bit-identical behavior: it
        # only binds when err < 1e-12, far under both the accept
        # threshold and the controller's own err_c >= 1e-10 clamp.
        return jnp.sqrt(jnp.maximum(total / n, 1e-24))

    def cond(s: _AdaptState):
        return jnp.logical_and(s.t < span, s.n_steps < max_steps)

    def body(s: _AdaptState):
        dt = jnp.minimum(s.dt, span - s.t)
        y5, y4 = _dopri5_step(field, params, s.t, s.y, dt)
        err = err_norm(y5, y4, s.y)
        accept = err <= 1.0
        # PI controller (order 5: exponents 0.7/5 and 0.4/5)
        err_c = jnp.maximum(err, 1e-10)
        factor = safety * err_c ** (-0.7 / 5.0) * s.err_prev ** (0.4 / 5.0)
        factor = jnp.clip(factor, min_factor, max_factor)
        new_dt = dt * factor
        return _AdaptState(
            t=jnp.where(accept, s.t + dt, s.t),
            y=jax.tree.map(lambda a, b: jnp.where(accept, a, b), y5, s.y),
            dt=new_dt,
            err_prev=jnp.where(accept, err_c, s.err_prev),
            n_steps=s.n_steps + 1,
        )

    init = _AdaptState(t=jnp.float32(0.0), y=y0, dt=dt0,
                       err_prev=jnp.float32(1.0), n_steps=jnp.int32(0))
    if impl == "scan":
        def scan_body(s, _):
            active = s.t < span
            # frozen trips run the body with dt forced to EXACTLY 0
            # (span - t can be epsilon-negative): y5 = y4 = y, so the
            # discarded branch stays finite — jnp.where's VJP sends a
            # zero cotangent into the untaken branch and 0 * inf = NaN
            # would otherwise poison the whole gradient
            s_in = s._replace(dt=jnp.where(
                active, s.dt, jnp.zeros_like(s.dt)),
                t=jnp.where(active, s.t, span))
            s2 = body(s_in)
            s = jax.tree.map(lambda a, b: jnp.where(active, a, b), s2, s)
            return s, None
        final, _ = lax.scan(scan_body, init, None, length=max_steps)
    elif impl == "while":
        final = lax.while_loop(cond, body, init)
    else:
        raise ValueError(f"unknown adaptive impl {impl!r}")
    if return_final_t:
        return final.y, t0 + direction * final.t
    return final.y


# ---------------------------------------------------------------------------
# Unified front-end
# ---------------------------------------------------------------------------

def odeint(field: Field, params, y0, t0, t1, *, method: str = "euler",
           num_steps: int = 1, rtol: float = 1e-5, atol: float = 1e-7,
           max_steps: int = 512, impl: str = "while"):
    """Integrate ``dy/dt = field(params, t, y)`` from t0 to t1.

    method: 'euler' | 'midpoint' | 'heun' | 'rk4' (fixed-step, ``num_steps``
    equal steps) or 'dopri5' (adaptive; rtol/atol/max_steps apply;
    ``impl='scan'`` selects the fixed-trip-count masked-acceptance
    variant — reverse-differentiable and episode-loop-nestable, see
    :func:`solve_adaptive`).
    """
    if method in _FIXED_STEPS:
        return solve_fixed(field, params, y0, t0, t1, method=method,
                           num_steps=num_steps)
    if method == "dopri5":
        return solve_adaptive(field, params, y0, t0, t1, rtol=rtol,
                              atol=atol, max_steps=max_steps, impl=impl)
    raise ValueError(f"unknown method {method!r}")
