#!/usr/bin/env python
"""Lever 19 (r8): probe the CRITIC landscape at the ground spawn state.

Lever 18c showed de-saturation is necessary but not sufficient: the
failing s12345/c=10 policy is fully linear at the ground probe
(|mu|max 0.272) yet acts ~(0,0) = HOVER thrust there (action bounds are
hover +/- 30% per motor, envs/quadrotor.py:65), so it sits on the floor
forever. This script asks whether the POLICY is ignoring a correct
critic or faithfully descending a wrong one: it sweeps min(Q1,Q2) over
the full normalized action square at the ground probe rows and prints
the argmax action, Q at hover (0,0), Q at full symmetric climb (+1,+1),
Q at the policy's deterministic action, and the directional derivative
of minQ along the climb direction at that action.

If argmax_a minQ(ground, a) is a climb action for the SUCCEEDING
weights but hover/flat for the FAILING ones, the blocker is critic
learning (no take-off successes in replay to propagate), not policy
optimization.

Usage: python scripts/quad_ground_q_probe.py <run_dir> [more run_dirs]
where run_dir contains actor.pkl/critic.pkl etc. (the innermost
NBC_LBAC_Quadrotor_s<seed> directory).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # noqa: E402 — before backend init

import jax.numpy as jnp
import numpy as np

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.config import get_config
from nlbac_tpu.envs import quadrotor as quad
from nlbac_tpu.nn import gaussian_policy_forward
from nlbac_tpu.nn.critics import twin_q_apply
from nlbac_tpu.nn.policy import ActionSpec
from nlbac_tpu.train.checkpoint import load_model_weights

GRID_N = 41
ROWS = {0: "ground", 3: "climb+0.05", 4: "climb+0.15"}


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    cfg = get_config("quadrotor")
    base = create_train_state(cfg, jax.random.PRNGKey(0))
    spec = ActionSpec.from_bounds(np.asarray(quad.SPEC.action_low),
                                  np.asarray(quad.SPEC.action_high))
    probe = quad.ground_probe_obs()

    # Normalized action grid y in [-1,1]^2 -> env thrusts y*scale + bias.
    ys = np.linspace(-1.0, 1.0, GRID_N)
    yy1, yy2 = np.meshgrid(ys, ys, indexing="ij")
    y_grid = np.stack([yy1.ravel(), yy2.ravel()], axis=-1)  # (N^2, 2)
    a_grid = jnp.asarray(y_grid * np.asarray(spec.scale)
                         + np.asarray(spec.bias))

    for run in sys.argv[1:]:
        ts = load_model_weights(run, base)
        mu, _ = gaussian_policy_forward(ts.policy, probe)
        mu = np.asarray(mu)
        print(f"===== {run}")
        for i, label in ROWS.items():
            obs_i = jnp.tile(probe[i][None, :], (a_grid.shape[0], 1))
            q1, q2 = twin_q_apply(ts.critic, obs_i, a_grid)
            minq = np.asarray(jnp.minimum(q1, q2)).ravel()
            k = int(minq.argmax())

            def minq_at(y):
                a = jnp.asarray(y) * jnp.asarray(spec.scale) \
                    + jnp.asarray(spec.bias)
                q1s, q2s = twin_q_apply(ts.critic, probe[i][None, :],
                                        a[None, :])
                return jnp.minimum(q1s, q2s).squeeze()

            y_pi = np.tanh(mu[i])
            # dQ/dy along the symmetric-climb direction at the policy's
            # deterministic action: what the SAC -minQ gradient tells the
            # policy about climbing, in normalized units.
            g = np.asarray(jax.grad(minq_at)(jnp.asarray(y_pi)))
            climb_dir = g @ np.array([1.0, 1.0]) / np.sqrt(2.0)
            print(f"  {label:>11}: argmax y=({y_grid[k][0]:+.2f},"
                  f"{y_grid[k][1]:+.2f}) Q*={minq[k]:+8.2f} | "
                  f"Q(hover)={minq_at((0.0, 0.0)):+8.2f} "
                  f"Q(climb++)={minq_at((1.0, 1.0)):+8.2f} | "
                  f"pi y=({y_pi[0]:+.2f},{y_pi[1]:+.2f}) "
                  f"Q(pi)={minq_at(y_pi):+8.2f} "
                  f"dQ/d(climb)={climb_dir:+8.2f}")


if __name__ == "__main__":
    main()
