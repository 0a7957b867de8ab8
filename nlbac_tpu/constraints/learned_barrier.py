"""Learned neural-barrier-certificate residual builder (NBC variants).

Reference: NBC-UNI/sac_cbf_clf/sac_cbf_clf.py:359-482 and
NBC-PVTOL/sac_cbf_clf/sac_cbf_clf.py:355-470.  One learned barrier replaces
the analytic CBFs:

  B_t     = BarrierNet(obs_t, u_t)                  DETACHED
  B_{t+1} = BarrierNet(obs_hat_{t+1}, u_{t+1})      obs_hat LIVE (gradient
            flows through the NODE prediction), u_{t+1} resampled at the
            DETACHED predicted obs and itself detached
  barrier residual = -(B_{t+1} - B_t) - gamma_b * B_t

The CLF residual matches the underlying env's: unicycle uses the predicted
lookahead point, PVTOL the reconstructed 11-d predicted obs.  NBC variants
train no backup controller (SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nlbac_tpu.config import ConstraintConfig, NodeConfig
from nlbac_tpu.envs import pvtol as pvtol_env
from nlbac_tpu.envs import unicycle as unicycle_env
from nlbac_tpu.nn import barrier_apply, lyapunov_apply, predict_next_state


def terms(ccfg: ConstraintConfig, ncfg: NodeConfig, node_params, field,
          lyap_params, obs, action, lyap_t, key, dt, env_name: str = None,
          barrier_params=None, resample=None, include_clf: bool = True, **_):
    if env_name == "unicycle":
        state = unicycle_env.obs_to_state(obs)
        pred = predict_next_state(ncfg, node_params, state, action, dt,
                                  field=field)  # (B, 3)
        obs1 = unicycle_env.state_to_obs(pred)  # (B, 7) live
        from nlbac_tpu.constraints.unicycle import _lookahead
        clf_in_next = _lookahead(pred[:, :2], pred[:, 2], ccfg.lookahead)
    elif env_name == "quadrotor":
        from nlbac_tpu.envs import quadrotor as quad_env
        state = quad_env.obs_to_state(obs)
        pred = predict_next_state(ncfg, node_params, state, action, dt,
                                  field=field)  # (B, 6)
        obs1 = quad_env.state_to_obs(pred)  # identity, live gradient
        clf_in_next = jnp.stack([pred[:, 0], pred[:, 2]], axis=-1)
    elif env_name == "pvtol":
        state7 = pvtol_env.obs_to_state(obs)
        dyn1 = predict_next_state(ncfg, node_params, state7[:, :6], action,
                                  dt, field=field)
        op1 = pvtol_env.propagate_operator(state7[:, 6], dyn1[:, 0])
        s1 = jnp.concatenate([dyn1, op1[:, None]], axis=1)
        obs1 = pvtol_env.state_to_obs(s1)  # (B, 11) live
        clf_in_next = obs1
    elif env_name == "identity":
        # generic host env whose observation IS the NODE state (e.g. a
        # HostEnvAdapter around safe-control-gym): predict directly in
        # obs space; CLF input = the predicted obs
        pred = predict_next_state(ncfg, node_params, obs, action, dt,
                                  field=field)
        obs1 = pred
        clf_in_next = pred
    else:
        raise ValueError(f"learned_barrier: unsupported env {env_name!r}")

    b_t = jax.lax.stop_gradient(barrier_apply(barrier_params, obs, action))
    # one stop on u1 prunes every gradient path through the resample;
    # obs1 itself stays LIVE for b_t1 (gradient into the action via the
    # NODE prediction — NBC-UNI/sac_cbf_clf.py:425-440)
    u1 = jax.lax.stop_gradient(resample(obs1, key))
    b_t1 = barrier_apply(barrier_params, obs1, u1)
    barrier = -(b_t1 - b_t) - ccfg.gamma_b * b_t  # (B, 1)

    if not include_clf:
        return barrier

    l_t = jax.lax.stop_gradient(lyapunov_apply(lyap_params, lyap_t))
    l_t1 = lyapunov_apply(lyap_params, clf_in_next)
    denom = dt if ccfg.clf_time_scaled else 1.0
    clf = (l_t1 - l_t) / denom + ccfg.gamma_l * l_t
    return jnp.concatenate([barrier, clf], axis=1)


NUM_PRIMARY = 2  # 1 learned barrier + 1 CLF
USES_BARRIER = True  # NBC family: the agent TD-trains the barrier critic
# The NBC-UNI/NBC-PVTOL presets train no backup controller
# (use_backup=False), but the quadrotor preset uses this builder WITH a
# backup (config.py _quadrotor: use_backup=True), so the backup
# multiplier state is live there: 1 barrier constraint, no CLF.
NUM_BACKUP = 1
