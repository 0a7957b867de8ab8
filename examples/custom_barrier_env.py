#!/usr/bin/env python
"""Add a NEW env with a LEARNED neural barrier certificate (the NBC
family) WITHOUT touching the package — the companion to
examples/custom_env.py, which demonstrates the hand-written-CBF path.

What is different from custom_env.py:

1. the env emits the NBC **barrier signal** channel: ``barrier_b`` (0)
   while safe, ``barrier_B`` (negative) on a violation — the TD target the
   barrier critic learns from (the driver threads the config's values
   into ``step()``; reference: NBC-UNI/envs/unicycle_env.py:50-53),
2. the constraint builder declares ``USES_BARRIER = True``: the agent
   then TD-trains the barrier critic + its target net and passes live
   ``barrier_params`` (and a ``resample`` closure over the current
   policy) into ``terms`` — the residual is the NBC form
   ``-(B_{t+1} - B_t) - gamma_b * B_t`` with B_t detached and B_{t+1}
   evaluated at the NODE-predicted next obs (gradient flows into the
   action through the prediction; NBC-UNI/sac_cbf_clf.py:425-440).

The task/dynamics are imported from custom_env.py (2-d point mass, one
hazard disk on the straight path to the goal) so this file contains
only what the learned-barrier path adds.

Run from the repo root:
    python examples/custom_barrier_env.py [--cpu]
"""
import os
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (PYTHONPATH
                                            # breaks axon; CLAUDE.md)
sys.path.insert(0, _HERE)  # sibling example module

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from custom_env import DT, PointMassEnv
from nlbac_tpu.constraints import register_builder
from nlbac_tpu.envs import register_env

# --------------------------------------------------------------------
# 1. The env: point mass + the NBC barrier-signal channel
# --------------------------------------------------------------------


class PointMassBarrierEnv:
    """PointMassEnv with barrier signals: b=0 safe, B<0 violated."""

    SPEC = PointMassEnv.SPEC._replace(name="pointmass_nbc")
    reset = PointMassEnv.reset
    obs_to_state = PointMassEnv.obs_to_state
    state_to_obs = PointMassEnv.state_to_obs

    @staticmethod
    def step(state, action, *, barrier_B: float = 0.0,
             barrier_b: float = 0.0, max_episode_steps: int = 150):
        new_state, out = PointMassEnv.step(
            state, action, max_episode_steps=max_episode_steps)
        violated = out.num_violations > 0
        sig = jnp.where(violated, jnp.float32(barrier_B),
                        jnp.float32(barrier_b))
        return new_state, out._replace(barrier_signal=sig)


# --------------------------------------------------------------------
# 2. The learned-barrier constraint builder (USES_BARRIER marks it as
#    NBC-family: the agent TD-trains barrier_params on barrier_signal)
# --------------------------------------------------------------------


class PointMassBarrierConstraints:
    NUM_PRIMARY = 2  # 1 learned barrier + 1 CLF
    NUM_BACKUP = 1  # unused (use_backup=False), sizes the λ vector
    USES_BARRIER = True

    @staticmethod
    def terms(ccfg, ncfg, node_params, field, lyap_params, obs, action,
              lyap_t, key, dt, barrier_params=None, resample=None,
              include_clf: bool = True, **_):
        from nlbac_tpu.nn import (barrier_apply, lyapunov_apply,
                                  predict_next_state)

        # obs IS the NODE state for this env, so predict in obs space
        pred = predict_next_state(ncfg, node_params, obs, action, dt,
                                  field=field)  # (B, 2), live gradient
        b_t = jax.lax.stop_gradient(barrier_apply(barrier_params, obs,
                                                  action))
        # u_{t+1}: current policy resampled at the prediction, detached
        # (only u_t carries gradient into the residual — NBC semantics)
        u1 = jax.lax.stop_gradient(resample(pred, key))
        b_t1 = barrier_apply(barrier_params, pred, u1)
        barrier = -(b_t1 - b_t) - ccfg.gamma_b * b_t  # (B, 1)
        if not include_clf:
            return barrier
        l_t = jax.lax.stop_gradient(lyapunov_apply(lyap_params, lyap_t))
        l_t1 = lyapunov_apply(lyap_params, pred)
        denom = dt if ccfg.clf_time_scaled else 1.0
        clf = (l_t1 - l_t) / denom + ccfg.gamma_l * l_t  # (B, 1)
        return jnp.concatenate([barrier, clf], axis=1)


# --------------------------------------------------------------------
# 3. Register + configure (the NBC-preset pattern) + train
# --------------------------------------------------------------------


def main():
    from nlbac_tpu.config import (ConstraintConfig, EnvConfig,
                                  NLBACConfig, NodeConfig, ReplayConfig,
                                  RunConfig, SacConfig, SupervisorConfig)
    from nlbac_tpu.train.cli import train

    register_env("pointmass_nbc", PointMassBarrierEnv)
    register_builder("pointmass_nbc", PointMassBarrierConstraints)

    cfg = NLBACConfig(
        env=EnvConfig(name="pointmass_nbc", dt=DT, max_episode_steps=150,
                      # the NBC channel: emitted by step() above, TD-
                      # learned by the barrier critic.  Signal SCALE
                      # matters: at -20 (the NBC-UNI value) the
                      # augmented quadratic (rho/2)*c^2 on the
                      # globally-negative early barrier dwarfs the task
                      # reward and pins the policy at spawn; -1 with the
                      # contraction gamma_b below is the measured sweet
                      # spot for this reward scale
                      barrier_signals=True, barrier_b=0.0,
                      barrier_B=-1.0),
        sac=SacConfig(hidden_dim=64, batch_size=64, start_steps=300,
                      updates_per_step=1),
        node=NodeConfig(form="control_affine", state_dim=2, action_dim=2,
                        hidden_dim=32, f_hidden_layers=1,
                        g_hidden_layers=1, update_interval=10,
                        max_batch=4096),
        # gamma_b < 1 gives the CONTRACTION form of the discrete CBF
        # condition (B_{t+1} >= (1-gamma_b)*B_t): the policy may pass
        # near the learned unsafe set as long as B improves, instead of
        # the hard B_{t+1} >= 0 wall gamma_b=1 demands over the
        # function-approximation-smoothed negative region (measured:
        # gamma_b=1 walls the corridor and the policy never reaches the
        # goal; 0.3 reaches it with zero late violations).  The ratio
        # floor is the NBC-PVTOL recipe (config.py _nbc_pvtol).
        constraint=ConstraintConfig(kind="pointmass_nbc", gamma_b=0.3,
                                    gamma_l=1.0, clf_time_scaled=True,
                                    use_ratio=True, ratio_floor=0.002,
                                    use_backup=False, rho_init=5.0),
        supervisor=SupervisorConfig(kind="none"),
        replay=ReplayConfig(capacity=8192, node_capacity=8192),
        run=RunConfig(seed=0, max_episodes=80, exp_name="PointMassNBC"),
        obs_dim=2, action_dim=2, lyap_dim=2,
    )

    out = tempfile.mkdtemp(prefix="nlbac_pointmass_nbc_")
    print(f"training the registered NBC custom env -> {out}")
    train(cfg, output_dir=out, quiet=True)

    import numpy as np

    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(os.path.join(out, "progress.txt"))
    r = np.asarray(cols["reward_train"])
    v = np.asarray(cols["safety_cost_train"])
    btd = np.asarray(cols["barrier_td_loss"])  # NBC-only column
    print(f"episode rewards: first 3 {r[:3].round(1).tolist()} "
          f"-> last 3 {r[-3:].round(1).tolist()}")
    print(f"safety cost:     first 10 sum {v[:10].sum():.2f} "
          f"-> last 5 sum {v[-5:].sum():.2f}")
    print(f"barrier TD loss: max {btd.max():.3g} "
          f"-> final {btd[-1]:.3g}")
    assert np.all(np.isfinite(r)), "training diverged"
    assert r[-3:].mean() > 100, "policy did not learn the goal bonus"
    # the barrier critic actually trained: its TD loss moved off zero
    # (a mis-gated barrier update would leave the column identically 0)
    assert btd.max() > 0, "barrier critic never updated"
    assert v[-5:].sum() == 0, \
        "learned barrier did not eliminate late safety cost"
    print("NBC custom env trained end-to-end: goal reached, barrier "
          "critic TD-trained, late safety cost suppressed")


if __name__ == "__main__":
    main()
