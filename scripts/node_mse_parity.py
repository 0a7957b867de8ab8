#!/usr/bin/env python
"""NODE one-step prediction MSE parity experiment.

The reference's only published quantitative results are one-step dynamics
MSEs of its NODE model vs a standard next-state NN (ground truth = gym env
output, nn.MSELoss; reference README.md:90-108 / BASELINE.md):

    Unicycle:  NODE 0.0012   NN 1.1023
    Cars:      NODE 0.3682   NN 1.5534
    PVTOL:     NODE 0.1258   NN 2.1180

This script reproduces the protocol with THIS framework: collect
random-policy transitions from the pure-JAX envs, fit (a) the NODE model
(Euler-through-the-field, exactly the reference's train_step) and (b) a
standard direct next-state MLP of matching capacity, and report held-out
one-step MSE in the NODE's state space. Writes PARITY.md.
"""

from __future__ import annotations

import os
import sys
import time

# runnable as `python scripts/node_mse_parity.py` from the repo root
# (sys.path[0] is scripts/; do NOT use PYTHONPATH — it breaks the axon
# TPU plugin registration, CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nlbac_tpu.config import get_config
from nlbac_tpu.envs import get_env
from nlbac_tpu.nn import (make_field, mlp_apply, mlp_init, mlp_sizes,
                          node_init, node_train_step)

REFERENCE = {  # README.md:97,102,107
    "unicycle": {"node": 0.0012, "nn": 1.1023},
    "cars": {"node": 0.3682, "nn": 1.5534},
    "pvtol": {"node": 0.1258, "nn": 2.1180},
}


THETA_IDX = {"unicycle": 2, "pvtol": 2}  # angle slot in the NODE state


def collect(cfg, n_steps: int, seed: int, horizon: int = 200):
    """Random-policy transitions in NODE state space, via one lax.scan.

    Rollouts are truncated every ``horizon`` steps so random actions don't
    drive the state unboundedly far from the training distribution (the
    reference fits on data from its own agent's bounded trajectories).
    Angle targets are unwrapped to the shortest-path branch so the
    one-step regression target is continuous where the dynamics are
    (arctan2-recovered angles jump by 2*pi at +/-pi otherwise)."""
    env = get_env(cfg.env.name)
    spec = env.SPEC
    low = jnp.array(spec.action_low)
    high = jnp.array(spec.action_high)
    if cfg.env.name == "pvtol":
        to_state = env.obs_to_dynamics_state
    else:
        to_state = env.obs_to_state

    def body(carry, inp):
        key, i = inp
        st, obs, t = carry
        a = jax.random.uniform(key, (spec.action_dim,), minval=low,
                               maxval=high)
        st2, out = env.step(st, a)
        x = to_state(obs[None])[0]
        x_next = to_state(out.obs[None])[0]
        ti = THETA_IDX.get(cfg.env.name)
        if ti is not None:
            dth = x_next[ti] - x[ti]
            dth = jnp.arctan2(jnp.sin(dth), jnp.cos(dth))
            x_next = x_next.at[ti].set(x[ti] + dth)
        # truncate rollouts so states stay bounded
        reset = jnp.logical_or(out.done, (i % horizon) == horizon - 1)
        st2 = jax.tree.map(
            lambda fresh, cur: jnp.where(reset, fresh, cur),
            env.reset(key)[0], st2)
        obs_next = jnp.where(reset, env.reset(key)[1], out.obs)
        t_next = jnp.where(reset, 0.0, t + cfg.env.dt)
        return (st2, obs_next, t_next), (x, a, x_next, t)

    st, obs = env.reset(jax.random.PRNGKey(seed))
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), n_steps)
    _, (x, a, x_next, t) = jax.lax.scan(
        body, (st, obs, jnp.float32(0.0)),
        (keys, jnp.arange(n_steps)))
    return x, a, x_next, t[:, None]


def fit_node(cfg, x, a, x_next, t, steps: int, lr: float = 1e-3):
    ncfg = cfg.node
    params = node_init(jax.random.PRNGKey(0), ncfg)
    field = make_field(ncfg)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    n = x.shape[0]
    ntr = int(n * 0.9)
    tt = t if ncfg.time_input else None

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (min(4096, ntr),), 0, ntr)
        tb = t[idx] if ncfg.time_input else None
        return node_train_step(ncfg, params, opt_state, opt, x[idx],
                               a[idx], x_next[idx], cfg.env.dt, t=tb,
                               field=field)

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i))
    from nlbac_tpu.nn import node_loss
    tt_hold = t[ntr:] if ncfg.time_input else None
    mse = node_loss(ncfg, params, x[ntr:], a[ntr:], x_next[ntr:],
                    cfg.env.dt, t=tt_hold, field=field)
    return float(mse)


def fit_plain_nn(cfg, x, a, x_next, t, steps: int, lr: float = 1e-3):
    """Standard next-state MLP: concat(x, u[, t]) -> x_{t+1} directly
    (the README's comparison NN)."""
    ncfg = cfg.node
    in_dim = ncfg.input_dim
    sizes = mlp_sizes(in_dim, ncfg.hidden_dim,
                      max(ncfg.f_hidden_layers, ncfg.mlp_hidden_layers),
                      ncfg.state_dim)
    params = mlp_init(jax.random.PRNGKey(0), sizes)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    n = x.shape[0]
    ntr = int(n * 0.9)

    def inputs(idx):
        parts = [x[idx], a[idx]]
        if ncfg.time_input:
            parts.append(t[idx])
        return jnp.concatenate(parts, axis=-1)

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (min(4096, ntr),), 0, ntr)
        def loss_fn(p):
            pred = mlp_apply(p, inputs(idx))
            return jnp.mean(jnp.square(pred - x_next[idx]))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i))
    hold = jnp.arange(ntr, n)
    pred = mlp_apply(params, inputs(hold))
    return float(jnp.mean(jnp.square(pred - x_next[hold])))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    rows = []
    for name in ("unicycle", "cars", "pvtol"):
        cfg = get_config(name)
        t0 = time.perf_counter()
        x, a, x_next, t = collect(cfg, 20000, seed=0)
        node_mse = fit_node(cfg, x, a, x_next, t, steps)
        nn_mse = fit_plain_nn(cfg, x, a, x_next, t, steps)
        dt = time.perf_counter() - t0
        ref = REFERENCE[name]
        rows.append((name, node_mse, ref["node"], nn_mse, ref["nn"], dt))
        print(f"{name}: NODE {node_mse:.3e} (ref {ref['node']}), "
              f"plain NN {nn_mse:.3e} (ref {ref['nn']})  [{dt:.0f}s]",
              flush=True)

    section = ("# PARITY — NODE one-step MSE vs the reference's "
               "published table\n\n")
    section += ("Protocol: 20k random-policy transitions per env, 90/10 "
                f"split, {steps} Adam(1e-3) steps, one-step Euler "
                "prediction in NODE state space (reference README.md:"
                "90-108; measured here on "
                f"{jax.default_backend()}).\n\n")
    section += ("| Env | NODE MSE (ours) | NODE MSE (reference) | "
                "plain-NN MSE (ours) | plain-NN MSE (reference) |\n")
    section += "|---|---|---|---|---|\n"
    for name, nm, rn_, pm, rp, _ in rows:
        section += f"| {name} | {nm:.3e} | {rn_} | {pm:.3e} | {rp} |\n"
    section += ("\nLower is better; 'ours' should be at or below the "
                "reference NODE column.\n")
    # Replace only this script's section (up to the first '## ' heading);
    # PARITY.md accumulates end-to-end run sections below it.
    try:
        existing = open("PARITY.md").read()
        cut = existing.find("\n## ")
        rest = existing[cut:] if cut != -1 else ""
    except FileNotFoundError:
        rest = ""
    with open("PARITY.md", "w") as f:
        f.write(section + rest)
    print("wrote PARITY.md (table section only)")


if __name__ == "__main__":
    main()
