"""PVTOL HOCBF/CLF residual builder (3-step NODE horizon, relative-degree-3
composition, analytic operator propagation).

Reference: PVTOL/sac_cbf_clf/sac_cbf_clf.py:424-738 (primary),
:740-1037 (backup).  The chain:

  x_{t+k+1} = NODE(x_{t+k}, u_{t+k});  op_{t+k+1} = op + 0.7 (x - op)
  u_{t+k} = controller(obs(x_{t+k}, op_{t+k})) DETACHED for k >= 1

Nine CBFs at four horizons composed as rel-degree-3 HOCBFs:
  term1 = h3 - h2 + g h2;  term2 = h2 - h1 + g h1;  term3 = h1 - h0 + g h0
  cbf = -(term1 - term2 + g term2 - (term2 - term3 + g term3)
          + g (term2 - term3 + g term3))

h families: 5 obstacle circles (1/2(||y-o||^2 - (1.2 r)^2)), two operator
distance half-planes with margin 0.9*operator_dist, and the y_max/y_min
box with delta 10.  CLF: L on the reconstructed 11-d obs of the 1-step
prediction, residual (L1 - L0)/1.0 + 0.1 L0 (ref :479-481).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nlbac_tpu.config import ConstraintConfig, NodeConfig
from nlbac_tpu.envs import pvtol as env
from nlbac_tpu.nn import lyapunov_apply, predict_next_state


def _chain(ncfg, node_params, field, state7, action, dt, resample, key,
           horizon: int):
    """Roll the NODE ``horizon`` steps, propagating the operator and
    re-sampling the controller at predicted (detached) observations.

    Returns the list of full 7-d states [s_t, s_{t+1}, ..., s_{t+horizon}]
    (gradients flow through the NODE predictions; resampled controls are
    detached)."""
    states = [state7]
    dyn = state7[:, :6]
    op = state7[:, 6]
    u = action
    keys = jax.random.split(key, horizon)
    for k in range(horizon):
        dyn = predict_next_state(ncfg, node_params, dyn, u, dt, field=field)
        op = env.propagate_operator(op, dyn[:, 0])
        s = jnp.concatenate([dyn, op[:, None]], axis=1)
        states.append(s)
        if k + 1 < horizon:
            obs_pred = env.state_to_obs(s)
            # one stop on the resampled action prunes every gradient
            # path through the resample — only u_t carries gradient
            # (PVTOL/sac_cbf_clf.py:483-490)
            u = jax.lax.stop_gradient(resample(obs_pred, keys[k]))
    return states


def _hocbf3(hs, gamma_b):
    """hs: list of 4 arrays (B, m) at horizons t..t+3 -> (B, m)."""
    h0, h1, h2, h3 = hs
    term1 = h3 - h2 + gamma_b * h2
    term2 = h2 - h1 + gamma_b * h1
    term3 = h1 - h0 + gamma_b * h0
    inner = term2 - term3 + gamma_b * term3
    return -(term1 - term2 + gamma_b * term2 - inner + gamma_b * inner)


def terms(ccfg: ConstraintConfig, ncfg: NodeConfig, node_params, field,
          lyap_params, obs, action, lyap_t, key, dt, resample=None,
          include_clf: bool = True, **_):
    if ccfg.horizon != 3:
        # the rel-degree-3 HOCBF composition below consumes exactly the
        # 4 horizon states t..t+3 — a different horizon would either
        # index out of bounds or roll the NODE further while the
        # residual silently ignores the extra states
        raise ValueError(
            f"pvtol HOCBF builder requires horizon=3 (rel-degree-3 "
            f"composition, PVTOL/sac_cbf_clf.py:459-534); got "
            f"{ccfg.horizon}")
    state7 = env.obs_to_state(obs)  # (B, 7)
    states = _chain(ncfg, node_params, field, state7, action, dt, resample,
                    key, horizon=ccfg.horizon)

    collision_radius = ccfg.collision_buffer * env.HAZARD_RADIUS
    op_margin = ccfg.operator_margin * env.OPERATOR_DIST
    dy = ccfg.box_delta_y

    # One batched h-family pass over all 4 horizon states (4, B, 7)
    # instead of 4 per-state passes: the episode program is latency-bound
    # on op count (CLAUDE.md), and the per-element arithmetic — hence the
    # output bits — is unchanged. Column order matches the reference's
    # [5 obstacle, op1, op2, ymax, ymin] (PVTOL/sac_cbf_clf/sac_cbf_clf.py
    # :556-685).
    s_all = jnp.stack(states)  # (4, B, 7)
    pos = s_all[..., :2]
    d2 = jnp.sum(jnp.square(pos[:, :, None, :]
                            - env.HAZARDS[None, None, :, :]), axis=3)
    h_obs = 0.5 * (d2 - collision_radius ** 2)  # (4, B, 5)
    h_op1 = (s_all[..., 0] - s_all[..., 6] + op_margin)[..., None]
    h_op2 = (s_all[..., 6] - s_all[..., 0] + op_margin)[..., None]
    h_ymax = (-s_all[..., 1] + env.Y_MAX - dy)[..., None]
    h_ymin = (s_all[..., 1] - env.Y_MIN - dy)[..., None]
    h = jnp.concatenate([h_obs, h_op1, h_op2, h_ymax, h_ymin], axis=2)
    cbf = _hocbf3([h[0], h[1], h[2], h[3]], ccfg.gamma_b)  # (B, 9)

    if not include_clf:
        return cbf

    l_t = jax.lax.stop_gradient(lyapunov_apply(lyap_params, lyap_t))
    obs1 = env.state_to_obs(states[1])  # live gradient through the NODE
    l_t1 = lyapunov_apply(lyap_params, obs1)
    denom = dt if ccfg.clf_time_scaled else 1.0
    clf = (l_t1 - l_t) / denom + ccfg.gamma_l * l_t
    return jnp.concatenate([cbf, clf], axis=1)


NUM_PRIMARY = 10  # 5 obstacle + 2 operator + 2 box HOCBFs + 1 CLF
NUM_BACKUP = 9
