from nlbac_tpu.ode.solvers import (  # noqa: F401
    euler_step,
    midpoint_step,
    heun_step,
    rk4_step,
    solve_fixed,
    solve_adaptive,
    odeint,
    odeint_grid,
)
from nlbac_tpu.ode.adjoint import odeint_adjoint  # noqa: F401
