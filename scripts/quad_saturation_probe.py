#!/usr/bin/env python
"""Measure tanh saturation of a trained quadrotor policy at the ground
probe batch (PARITY.md r7 levers 15-18).

Loads a run's final weights on CPU (never touches the TPU tunnel) and
prints, per probe row of ``envs.quadrotor.ground_probe_obs()``:
|pre-tanh mean|_max, the worst gradient factor min(1 - tanh(mu)^2), and
the deterministic action. The lever-15 diagnosis found |mu| = 1.8-5.7
(gradient factor ~5e-5) at these states in every unregularized lineage;
lever 18's probe regularizer is supposed to pull them inside the linear
band so the policy gradient there carries direction again.

Usage: python scripts/quad_saturation_probe.py <run_dir> [more run_dirs]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # noqa: E402 — before backend init

import numpy as np

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.config import get_config
from nlbac_tpu.envs import quadrotor as quad
from nlbac_tpu.nn import gaussian_policy_forward
from nlbac_tpu.train.checkpoint import load_model_weights


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    cfg = get_config("quadrotor")
    base = create_train_state(cfg, jax.random.PRNGKey(0))
    probe = quad.ground_probe_obs()
    for run in sys.argv[1:]:
        ts = load_model_weights(run, base)
        mu, _ = gaussian_policy_forward(ts.policy, probe)
        mu = np.asarray(mu)
        grad_factor = 1.0 - np.tanh(mu) ** 2
        print(f"===== {run}")
        print(f"  |mu|max over probe batch: {np.abs(mu).max():.3f}   "
              f"worst grad factor: {grad_factor.min():.2e}")
        labels = ["ground"] + [f"probe{i}" for i in range(1, len(mu))]
        for i in (0, 9, 10, 11, 12):  # ground + theta/omega excursions
            print(f"  {labels[i]:>7}: mu=({mu[i][0]:+.3f},{mu[i][1]:+.3f}) "
                  f"tanh=({np.tanh(mu[i][0]):+.4f},{np.tanh(mu[i][1]):+.4f}) "
                  f"gf_min={grad_factor[i].min():.2e}")


if __name__ == "__main__":
    main()
