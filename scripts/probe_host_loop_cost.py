#!/usr/bin/env python
"""Decompose the host-loop per-step wall cost on the tunneled TPU:
(a) blocking no-op round trip, (b) device_put of the per-step H2D
payload, (c) fused step_train dispatch issued async then blocked in
bulk (does dispatch itself block?), (d) the full per-step sequence.

Run from the repo root: python scripts/probe_host_loop_cost.py
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def t(fn, n=20):
    fn()  # warm
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    from nlbac_tpu.config import get_config
    from nlbac_tpu.envs import as_host_env, get_env
    from nlbac_tpu.train.driver import build_step_kwargs
    from nlbac_tpu.train import host_loop as hl
    from nlbac_tpu.agent import create_train_state, make_agent
    from nlbac_tpu.train.supervisor import init_supervisor

    cfg = get_config("cars")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=300),
        sac=dataclasses.replace(cfg.sac, start_steps=200))
    mod = get_env("cars")
    adapter = as_host_env(mod, seed=0, max_episode_steps=300,
                          step_kwargs=build_step_kwargs(cfg, mod))

    U, B = cfg.sac.updates_per_step, cfg.sac.batch_size
    print(f"U={U} B={B}")

    # --- (a) blocking no-op round trip --------------------------------
    one = jax.device_put(np.float32(1))
    noop = jax.jit(lambda x: x + 1)
    _ = noop(one).block_until_ready()
    print(f"(a) blocked no-op dispatch: {t(lambda: jax.device_get(noop(one))) * 1e3:.1f} ms")

    # --- (b) device_put of the step payload ---------------------------
    rings = hl.HostRings(cfg, adapter.SPEC, seed=0)
    rows = np.zeros((U, B, rings.width), np.float32)
    ctl = np.zeros(64, np.float32)
    print(f"rows payload {rows.nbytes/1e3:.0f} kB")
    print(f"(b) device_put((ctl, rows)): {t(lambda: jax.tree.map(lambda x: x.block_until_ready(), jax.device_put((ctl, rows)))) * 1e3:.1f} ms")
    print(f"(b2) device_put(ctl only):  {t(lambda: jax.device_put(ctl).block_until_ready()) * 1e3:.1f} ms")

    # --- (c) step_train dispatch cost: async-queue k then block -------
    agent = make_agent(cfg, env_override=adapter)
    key = jax.random.PRNGKey(0)
    ts = create_train_state(cfg, key)
    sup = init_supervisor(cfg.supervisor)
    run_key = jax.random.PRNGKey(1)

    # replicate the fused program shape from host_loop
    obs_dim, lyap_dim = adapter.SPEC.obs_dim, adapter.SPEC.lyap_dim
    CTL = 6 + 3 * obs_dim + lyap_dim + 1
    ctl = np.zeros(CTL, np.float32)

    @jax.jit
    def step_train(ts, ctl, rl_rows, node_rows, sup, run_key):
        i_ep = ctl[1].astype(jnp.int32)
        k_step = jax.random.fold_in(run_key, ctl[0].astype(jnp.int32))
        node_batch = rings.unpack(node_rows)
        m = None
        for j in range(U):
            batch = rings.unpack(rl_rows[j])
            kj = jax.random.fold_in(k_step, j)
            ts, m = agent.update_from_batch(ts, batch, node_batch, kj,
                                            i_ep)
        return ts, m["qf1_loss"]

    zero_node = jax.device_put(
        np.zeros((cfg.node.max_batch, rings.width), np.float32))
    rows = np.random.rand(U, B, rings.width).astype(np.float32)

    ts2, q = step_train(ts, ctl, rows, zero_node, sup, run_key)
    q.block_until_ready()

    def chain(k):
        t0 = time.perf_counter()
        tloc = ts
        out = None
        for _ in range(k):
            tloc, out = step_train(tloc, ctl, rows, zero_node, sup,
                                   run_key)
        jax.device_get(out)
        return time.perf_counter() - t0

    chain(2)
    for k in (1, 2, 4, 8):
        ms = min(chain(k) for _ in range(6)) * 1e3
        print(f"(c) chain of {k} step_train + 1 blocking get: {ms:.1f} ms"
              f" ({ms / k:.1f} ms/step marginal)")

    # --- (d) the REAL loop pattern: dispatch -> blocking get, alternating
    def real_pattern(k, fresh, get_tuple=True):
        tloc = ts
        outs = []
        t0 = time.perf_counter()
        for i in range(k):
            r = (np.random.rand(U, B, rings.width).astype(np.float32)
                 if fresh else rows)
            c = (np.random.rand(CTL).astype(np.float32)
                 if fresh else ctl)
            tloc, out = step_train(tloc, c, r, zero_node, sup, run_key)
            outs.append(float(jax.device_get(out)))  # block EVERY step
        return (time.perf_counter() - t0) / k

    for fresh in (False, True):
        real_pattern(3, fresh)
        ms = min(real_pattern(10, fresh) for _ in range(3)) * 1e3
        print(f"(d) dispatch+get alternating, fresh_args={fresh}: "
              f"{ms:.1f} ms/step")

    # --- (e) same but stage the H2D through an async identity dispatch
    stage = jax.jit(lambda c, r: (c, r))

    def staged_pattern(k):
        tloc = ts
        t0 = time.perf_counter()
        c_d, r_d = stage(ctl, rows)  # step t+1's args staged at step t
        for i in range(k):
            tloc, out = step_train(tloc, c_d, r_d, zero_node, sup,
                                   run_key)
            c_d, r_d = stage(
                np.random.rand(CTL).astype(np.float32),
                np.random.rand(U, B, rings.width).astype(np.float32))
            float(jax.device_get(out))
        return (time.perf_counter() - t0) / k

    staged_pattern(3)
    ms = min(staged_pattern(10) for _ in range(3)) * 1e3
    print(f"(e) staged async H2D + dispatch+get: {ms:.1f} ms/step")

    # --- (f) one flat arg instead of two -------------------------------
    FLAT = CTL + U * B * rings.width

    @jax.jit
    def step_flat(ts, flat, node_rows, sup, run_key):
        c = flat[:CTL]
        r = flat[CTL:].reshape(U, B, rings.width)
        i_ep = c[1].astype(jnp.int32)
        k_step = jax.random.fold_in(run_key, c[0].astype(jnp.int32))
        node_batch = rings.unpack(node_rows)
        m = None
        for j in range(U):
            batch = rings.unpack(r[j])
            kj = jax.random.fold_in(k_step, j)
            ts, m = agent.update_from_batch(ts, batch, node_batch, kj,
                                            i_ep)
        return ts, m["qf1_loss"]

    def flat_pattern(k):
        tloc = ts
        t0 = time.perf_counter()
        for i in range(k):
            flat = np.random.rand(FLAT).astype(np.float32)
            tloc, out = step_flat(tloc, flat, zero_node, sup, run_key)
            float(jax.device_get(out))
        return (time.perf_counter() - t0) / k

    flat_pattern(3)
    ms = min(flat_pattern(10) for _ in range(3)) * 1e3
    print(f"(f) ONE flat numpy arg + dispatch+get: {ms:.1f} ms/step")


if __name__ == "__main__":
    main()
