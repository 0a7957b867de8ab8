"""Fixed-step torchdiffeq stub.

The reference always calls odeint(..., method='euler') with a 2-point time
grid [0, dt]; torchdiffeq's euler solver steps exactly on the grid points, so
the faithful replacement is one explicit Euler step per grid interval.
Tolerances (atol/rtol) are inert for fixed-step methods (SURVEY §2.2).
Differentiable via plain autograd, matching torchdiffeq's default
(non-adjoint) backward.
"""
import torch


def odeint(func, y0, t, rtol=None, atol=None, method="euler", options=None):
    if method not in (None, "euler"):
        raise NotImplementedError(f"stub odeint supports euler only, got {method}")
    ys = [y0]
    y = y0
    for i in range(len(t) - 1):
        dt = t[i + 1] - t[i]
        y = y + dt * func(t[i], y)
        ys.append(y)
    return torch.stack(ys)
