"""Optimize-then-discretize (adjoint / backsolve) gradients for the fixed-
step solvers.

The default gradient path in :mod:`nlbac_tpu.ode.solvers` is
discretize-then-optimize: JAX differentiates straight through the scan,
which is exact for the discrete solution and is what the reference's
autograd-through-torchdiffeq does for its fixed-step Euler calls.  For long
horizons that stores every stage; the adjoint method instead re-integrates
an augmented system backwards, trading compute for O(1) memory
(Chen et al., Neural ODEs, 2018).

Math.  For y' = f(theta, t, y), loss L(y(t1)), adjoint a(t) = dL/dy(t):

    da/dt      = -a^T df/dy          with a(t1) = dL/dy1
    dL/dtheta  = int_{t0}^{t1} a^T df/dtheta dt

We integrate the augmented state (y, a, g_theta) backwards via the
substitution s = t0 + t1 - t, which turns the backward solve into a forward
solve of

    d/ds (y, a, g) = (-f, +a^T df/dy, +a^T df/dtheta)

from s=t0 (with (y1, dL/dy1, 0)) to s=t1, using the same RK method.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nlbac_tpu.ode import solvers


def odeint_adjoint(field, params, y0, t0, t1, *, method: str = "euler",
                   num_steps: int = 1, rtol: float = 1e-5,
                   atol: float = 1e-7, max_steps: int = 512):
    """Integration with adjoint (backsolve) gradients.

    Same forward values as ``solvers.odeint``; the VJP re-integrates the
    augmented system backwards instead of storing forward stages.  Supports
    every solver the forward path does: the fixed-step RK family
    (``num_steps`` applies) and ``'dopri5'`` (adaptive both ways —
    ``rtol``/``atol``/``max_steps`` govern forward AND backward solves, the
    torchdiffeq ``odeint_adjoint`` capability surface)."""

    def _integrate(f, p, y, lo, hi):
        if method == "dopri5":
            return solvers.solve_adaptive(f, p, y, lo, hi, rtol=rtol,
                                          atol=atol, max_steps=max_steps)
        return solvers.solve_fixed(f, p, y, lo, hi, method=method,
                                   num_steps=num_steps)

    @jax.custom_vjp
    def _solve(params_, y0_):
        return _integrate(field, params_, y0_, t0, t1)

    def _fwd(params_, y0_):
        y1 = _solve(params_, y0_)
        return y1, (params_, y1)

    def _bwd(res, g):
        params_, y1 = res
        zero_p = jax.tree.map(jnp.zeros_like, params_)

        def rev_field(_, s, aug):
            y, a, _gp = aug
            t = t0 + t1 - s
            f_y, vjp = jax.vjp(lambda pp, yy: field(pp, t, yy), params_, y)
            gp, gy = vjp(a)  # (a^T df/dtheta, a^T df/dy)
            return (jax.tree.map(jnp.negative, f_y), gy, gp)

        aug0 = (y1, g, zero_p)
        _, a0, grad_p = _integrate(rev_field, None, aug0, t0, t1)
        return grad_p, a0

    _solve.defvjp(_fwd, _bwd)
    return _solve(params, y0)
