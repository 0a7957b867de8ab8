#!/usr/bin/env python
"""Interleaved A/B: stacked vs per-state h-family computation in the
PVTOL constraint builder.

Variant NEW = current code: one batched families pass over the stacked
(4, B, 7) horizon states + one HOCBF composition on (4, B, 9).
Variant OLD = per-state passes (4x families + 5x _hocbf3), the round-2
baseline. Same per-element arithmetic — final train states must be
bit-equal; only the op count differs.

Run on the TPU from the repo root: python scripts/ab_pvtol_families.py
"""
import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_old_terms():
    from nlbac_tpu.constraints.pvtol import _chain, _hocbf3
    from nlbac_tpu.envs import pvtol as env
    from nlbac_tpu.nn import lyapunov_apply

    def terms(ccfg, ncfg, node_params, field, lyap_params, obs, action,
              lyap_t, key, dt, resample=None, include_clf=True, **_):
        state7 = env.obs_to_state(obs)
        states = _chain(ncfg, node_params, field, state7, action, dt,
                        resample, key, horizon=ccfg.horizon)
        collision_radius = ccfg.collision_buffer * env.HAZARD_RADIUS
        op_margin = ccfg.operator_margin * env.OPERATOR_DIST
        dy = ccfg.box_delta_y

        def families(s):
            pos = s[:, :2]
            d2 = jnp.sum(jnp.square(pos[:, None, :]
                                    - env.HAZARDS[None, :, :]), axis=2)
            h_obs = 0.5 * (d2 - collision_radius ** 2)
            h_op1 = (s[:, 0] - s[:, 6] + op_margin)[:, None]
            h_op2 = (s[:, 6] - s[:, 0] + op_margin)[:, None]
            h_ymax = (-s[:, 1] + env.Y_MAX - dy)[:, None]
            h_ymin = (s[:, 1] - env.Y_MIN - dy)[:, None]
            return h_obs, h_op1, h_op2, h_ymax, h_ymin

        fams = [families(s) for s in states]
        cbf_cols = [_hocbf3([fams[k][fam] for k in range(4)], ccfg.gamma_b)
                    for fam in range(5)]
        cbf = jnp.concatenate(cbf_cols, axis=1)
        if not include_clf:
            return cbf
        l_t = jax.lax.stop_gradient(lyapunov_apply(lyap_params, lyap_t))
        obs1 = env.state_to_obs(states[1])
        l_t1 = lyapunov_apply(lyap_params, obs1)
        denom = dt if ccfg.clf_time_scaled else 1.0
        clf = (l_t1 - l_t) / denom + ccfg.gamma_l * l_t
        return jnp.concatenate([cbf, clf], axis=1)

    return terms


def main():
    import nlbac_tpu.constraints.pvtol as pvtol_mod
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import get_config
    from nlbac_tpu.train.driver import create_replays, make_episode_runner

    steps = 400
    episodes = 10
    cfg = get_config("pvtol")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=steps),
        sac=dataclasses.replace(cfg.sac, start_steps=200))

    def fresh_state():
        ts = create_train_state(cfg, jax.random.PRNGKey(0))
        rl, node = create_replays(cfg)
        return (ts, rl, node, jax.random.PRNGKey(1), jnp.int32(0))

    new_terms = pvtol_mod.terms
    runners, states = {}, {}
    # trace NEW first (unpatched), then patch in OLD and trace it
    runners["new"] = jax.jit(make_episode_runner(cfg))
    states["new"] = fresh_state()
    ts, rl, node, key, total = states["new"]
    out = runners["new"](ts, rl, node, jax.random.PRNGKey(9), jnp.int32(0),
                         total)
    out[3].reward.block_until_ready()  # compile

    pvtol_mod.terms = make_old_terms()
    try:
        runners["old"] = jax.jit(make_episode_runner(cfg))
        states["old"] = fresh_state()
        ts, rl, node, key, total = states["old"]
        out = runners["old"](ts, rl, node, jax.random.PRNGKey(9),
                             jnp.int32(0), total)
        out[3].reward.block_until_ready()
    finally:
        pvtol_mod.terms = new_terms

    results = {n: [] for n in runners}
    for ep in range(episodes):
        for name, run in runners.items():
            ts, rl, node, key, total = states[name]
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            ts, rl, node, m, total = run(ts, rl, node, k, jnp.int32(ep),
                                         total)
            m.reward.block_until_ready()
            dt = time.perf_counter() - t0
            states[name] = (ts, rl, node, key, total)
            if ep >= 2:
                results[name].append(steps / dt)
            print(f"ep {ep} {name:4s}: {steps / dt:8.1f} steps/s",
                  flush=True)

    meds = {n: statistics.median(r) for n, r in results.items()}
    for name, med in meds.items():
        print(f"{name}: median {med:.1f} steps/s over "
              f"{len(results[name])} episodes")
    print(f"new/old = {meds['new'] / meds['old']:.3f}")

    import numpy as np
    for a, b in zip(jax.tree_util.tree_leaves(states["new"][0]),
                    jax.tree_util.tree_leaves(states["old"][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("final train states bit-equal (new == old)")


if __name__ == "__main__":
    main()
