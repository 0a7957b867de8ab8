#!/usr/bin/env python
"""Headline benchmark: NLBAC training throughput on TPU.

Primary metric: Unicycle env steps/sec, where each env step carries
updates_per_step=2 full gradient updates plus interval-gated NODE fits —
the reference's hot loop (UNI/main.py:56-104).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "extra": {...}}

vs_baseline: the same per-step workload implemented with torch (CPU),
structurally identical to the reference's update
(UNI/sac_cbf_clf/sac_cbf_clf.py:181-319): the reference itself hardcodes
CUDA (model.py:11) and publishes no throughput numbers (BASELINE.md), so
a torch-CPU replica is the only baseline runnable in this image. The
live replica measurement is host-load sensitive (observed 4.2-12.2
steps/s across runs), so the ratio divides by max(live, recorded-best
12.23 from BASELINE.md) — the CONSERVATIVE (smallest defensible)
speedup; both numbers are reported in extra.

extra carries the secondary metrics (VERDICT r1 item 5):
- cars / pvtol steps/sec (pvtol's 3-step rel-degree-3 HOCBF chain is the
  most expensive program), measured live under a soft time budget;
- the per-phase device-time split (env+select+replay vs update marginal,
  via an updates_per_step=0 ablation program);
- a note that MFU is structurally ~0 for width-100/256 MLP workloads:
  the programs are latency-bound on op count, so steps/sec and the
  per-phase latency split are the meaningful metrics here.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

_T0 = time.perf_counter()
SOFT_BUDGET_S = 900.0  # skip remaining secondary presets past this point


def _elapsed():
    return time.perf_counter() - _T0


def bench_preset(preset: str, episodes: int, steps: int,
                 updates_per_step=None) -> float:
    import jax
    import jax.numpy as jnp
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import get_config
    from nlbac_tpu.train.driver import create_replays, make_episode_runner

    cfg = get_config(preset)
    sac_kw = dict(start_steps=200)
    if updates_per_step is not None:
        sac_kw["updates_per_step"] = updates_per_step
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=steps),
        sac=dataclasses.replace(cfg.sac, **sac_kw))
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg)
    # AOT lowering cache (train/aot.py): through the tunneled backend the
    # jaxpr->MLIR lowering alone swings 5-300s per program; reusing the
    # serialized module keeps the bench's startup (4 programs) bounded.
    # Fail-open to plain jit on any cache machinery error.
    from nlbac_tpu.train.aot import cached_episode_runner
    example = (ts, rl, node, jax.random.PRNGKey(0), jnp.int32(0),
               jnp.int32(0))
    run = cached_episode_runner(cfg, example)

    total = jnp.int32(0)
    # episode 0: compile + warmup (excluded from timing)
    ts, rl, node, m, total = run(ts, rl, node, jax.random.PRNGKey(0),
                                 jnp.int32(0), total)
    m.reward.block_until_ready()

    # MEDIAN of per-episode rates, not total-steps/total-time: the
    # tunneled backend's round-trip cost occasionally stalls a single
    # dispatch for seconds (CLAUDE.md "tunnel flakiness"; an interleaved
    # A/B in the same window measured episode rates of [109, 1755, ...,
    # 2218] steps/s for the SAME program) — one stalled episode must not
    # wreck the artifact the way it wrecks a pooled mean.
    rates = []
    for ep in range(1, episodes):
        t0 = time.perf_counter()
        ts, rl, node, m, total = run(ts, rl, node, jax.random.PRNGKey(ep),
                                     jnp.int32(ep), total)
        m.reward.block_until_ready()
        rates.append(int(m.steps) / (time.perf_counter() - t0))
    return sorted(rates)[len(rates) // 2]


def bench_torch_baseline(n_steps: int = 12) -> float:
    """The reference's per-env-step device work, in torch on CPU:
    2 updates x (twin-Q TD + Lyapunov TD + policy & backup losses with
    one NODE forward each + 2 temperature updates) + NODE fit every 10
    updates on a 32768 batch, plus the env step itself."""
    import numpy as np
    import torch
    import torch.nn as nn

    torch.set_num_threads(max(1, torch.get_num_threads()))
    hidden, batch, node_batch = 256, 128, 32768
    obs_dim, act_dim = 7, 2

    def mlp(sizes):
        layers = []
        for a, b in zip(sizes[:-1], sizes[1:]):
            layers += [nn.Linear(a, b), nn.ReLU()]
        return nn.Sequential(*layers[:-1])

    q1 = mlp([obs_dim + act_dim, hidden, hidden, 1])
    q2 = mlp([obs_dim + act_dim, hidden, hidden, 1])
    lyap = mlp([2, hidden, hidden, 1])
    policy = mlp([obs_dim, hidden, hidden, 2 * act_dim])
    backup = mlp([obs_dim, hidden, hidden, 2 * act_dim])
    f_net = mlp([3, 100, 100, 100, 100, 3])
    g_net = mlp([3, 100, 100, 100, 6])
    opts = [torch.optim.Adam(m.parameters(), lr=3e-4)
            for m in (q1, q2, lyap, policy, backup, f_net, g_net)]

    obs = torch.randn(batch, obs_dim)
    act = torch.randn(batch, act_dim)
    lyap_in = torch.randn(batch, 2)
    node_x = torch.randn(node_batch, 3)
    node_u = torch.randn(node_batch, 2)

    def node_forward(x, u):
        gx = g_net(x).reshape(-1, 3, 2)
        return x + 0.02 * (f_net(x) + torch.bmm(gx, u.unsqueeze(-1))
                           .squeeze(-1))

    def one_update(upd_idx):
        # critic + lyapunov TD
        for net, opt, inp in ((q1, opts[0], torch.cat([obs, act], 1)),
                              (q2, opts[1], torch.cat([obs, act], 1)),
                              (lyap, opts[2], lyap_in)):
            opt.zero_grad()
            loss = ((net(inp) - 1.0) ** 2).mean()
            loss.backward()
            opt.step()
        # primary + backup policy losses, each with a NODE one-step
        for net, opt in ((policy, opts[3]), (backup, opts[4])):
            opt.zero_grad()
            pa = torch.tanh(net(obs)[:, :act_dim])
            q = q1(torch.cat([obs, pa], 1))
            pred = node_forward(obs[:, :3], pa)
            loss = (-q.mean() + (pred ** 2).mean()
                    + lyap(pred[:, :2]).mean())
            loss.backward()
            opt.step()
        # NODE fit every 10 updates
        if upd_idx % 10 == 0:
            opts[5].zero_grad()
            opts[6].zero_grad()
            loss = ((node_forward(node_x, node_u) - node_x) ** 2).mean()
            loss.backward()
            opts[5].step()
            opts[6].step()

    # env step cost (numpy, as the reference's)
    state = np.array([-2.5, -2.5, 0.0])

    def env_step(a):
        nonlocal state
        g = np.array([[np.cos(state[2]), 0], [np.sin(state[2]), 0],
                      [0, 1.0]])
        state = state + 0.02 * (g @ a)

    upd = 0
    t0 = time.perf_counter()
    for _ in range(n_steps):
        for _ in range(2):  # updates_per_step
            one_update(upd)
            upd += 1
        with torch.no_grad():
            a = torch.tanh(policy(torch.randn(1, obs_dim))[0, :act_dim])
        env_step(a.numpy())
    dt = time.perf_counter() - t0
    return n_steps / dt


def main():
    from nlbac_tpu.train.cli import enable_compilation_cache
    enable_compilation_cache()
    fast = "--fast" in sys.argv

    # 5 timed episodes for the headline metric (better median support)
    uni_sps = bench_preset("unicycle", episodes=6, steps=400)
    # phase split: same program minus the gradient updates
    noupd_sps = bench_preset("unicycle", episodes=4, steps=400,
                             updates_per_step=0)
    env_us = 1e6 / noupd_sps
    upd_us = 1e6 / uni_sps - env_us

    extra = {
        "unicycle_env_select_replay_us_per_step": round(env_us, 1),
        "unicycle_update_marginal_us_per_step": round(upd_us, 1),
        "note": ("MFU is structurally ~0 for width-100/256 MLPs; the "
                 "programs are latency-bound on op count, so steps/sec "
                 "and the phase split are the meaningful metrics"),
    }
    # every program family gets a throughput number (VERDICT r2 item 3):
    # cars (non-affine NODE + time input), pvtol (3-step HOCBF chain),
    # nbc_* (learned-barrier TD + target soft-update in the hot loop),
    # quadrotor (curriculum reset + kill semantics + normalized NODE)
    for preset, steps in (() if fast else
                          (("cars", 300), ("pvtol", 400),
                           ("nbc_unicycle", 400), ("nbc_pvtol", 400),
                           ("quadrotor", 400))):
        if _elapsed() > SOFT_BUDGET_S:
            extra[f"{preset}_steps_per_sec"] = "skipped (time budget)"
            continue
        # contain per-preset failures (the tunneled backend occasionally
        # stalls/errors; a secondary preset must not kill the artifact)
        try:
            extra[f"{preset}_steps_per_sec"] = round(
                bench_preset(preset, episodes=4, steps=steps), 2)
        except Exception as e:  # noqa: BLE001
            extra[f"{preset}_steps_per_sec"] = f"error: {type(e).__name__}"

    # host-loop architecture throughput (VERDICT r3 item 2): the cars
    # workload through the host-loop training mode (host gym API +
    # native C++ rings + per-update device dispatch). An ARCHITECTURE
    # number: the gap vs the fused cars_steps_per_sec above is the
    # per-step dispatch/round-trip cost the fused design eliminates.
    try:
        from nlbac_tpu.runtime_native import native_available
        if not native_available():
            extra["host_loop_cars_steps_per_sec"] = "skipped (no native)"
        elif _elapsed() > SOFT_BUDGET_S:
            extra["host_loop_cars_steps_per_sec"] = "skipped (time budget)"
        else:
            from nlbac_tpu.config import get_config
            from nlbac_tpu.envs import as_host_env, get_env
            from nlbac_tpu.train.driver import build_step_kwargs
            from nlbac_tpu.train.host_loop import train_host_env

            _hcfg = get_config("cars")
            _hcfg = dataclasses.replace(
                _hcfg, env=dataclasses.replace(_hcfg.env,
                                               max_episode_steps=300),
                sac=dataclasses.replace(_hcfg.sac, start_steps=200))
            _hmod = get_env("cars")
            _had = as_host_env(_hmod, seed=0,
                               max_episode_steps=300,
                               step_kwargs=build_step_kwargs(_hcfg, _hmod))
            _, _hist = train_host_env(_hcfg, _had, episodes=4, seed=0)
            # row 0 = compile; statistics.median averages the middle
            # pair for even counts (advisor r4: len//2 on 2 samples
            # picked the larger, biasing the number upward)
            import statistics
            extra["host_loop_cars_steps_per_sec"] = round(
                statistics.median(r["episode_steps"] / r["wall_s"]
                                  for r in _hist[1:]), 2)
    except Exception as e:  # noqa: BLE001
        extra["host_loop_cars_steps_per_sec"] = f"error: {type(e).__name__}"

    # serving latency of the deployment artifact (utils/export_policy):
    # batch-64 deterministic head through jax.export round-trip —
    # dispatch-dominated through the tunnel, so this measures the
    # deployment overhead floor, not MLP FLOPs. Contained: a failure
    # must not kill the headline metric.
    try:
        import tempfile
        import time as _time

        import jax
        import numpy as np

        from nlbac_tpu.agent import create_train_state
        from nlbac_tpu.config import get_config
        from nlbac_tpu.utils.export_policy import export_policy, load_policy

        _cfg = get_config("unicycle")
        _ts = create_train_state(_cfg, jax.random.PRNGKey(0))
        _p = os.path.join(tempfile.mkdtemp(), "policy.nlbac")
        export_policy(_cfg, _ts, _p)
        _fn, _ = load_policy(_p)
        _obs = np.zeros((64, 7), np.float32)
        _fn(_obs).block_until_ready()  # compile
        # true per-request round-trip latency: block EVERY call (the old
        # loop dispatched 200 async calls and blocked once — that
        # measures pipelined dispatch throughput, reported separately)
        _n = 100
        _t0 = _time.perf_counter()
        for _ in range(_n):
            _fn(_obs).block_until_ready()
        extra["serving_latency_us_b64"] = round(
            (_time.perf_counter() - _t0) / _n * 1e6, 1)
        _t0 = _time.perf_counter()
        for _ in range(_n):
            _a = _fn(_obs)
        _a.block_until_ready()
        extra["serving_dispatch_throughput_us_b64"] = round(
            (_time.perf_counter() - _t0) / _n * 1e6, 1)
        # the blocked number is dominated by the axon tunnel round trip,
        # which drifts ~400us-30ms across hours (CLAUDE.md); the
        # dispatch-throughput number is the stable one

        # decomposition (VERDICT r3 weak #3): device-execution share via
        # a serially-CHAINED repeat-K of the exported policy inside ONE
        # dispatch (the pad feeds action back into obs, so XLA cannot
        # parallelize the iterations); tunnel share via a blocked
        # 1-element no-op program.  device + tunnel ≈ the blocked
        # per-call number, attributing the 3 orders of magnitude.
        import jax.numpy as jnp
        from jax import export as jexport, lax

        with open(_p, "rb") as f:
            _exported = jexport.deserialize(f.read())
        _K = 1000

        @jax.jit
        def _rep(obs):
            def body(_, o):
                act = _exported.call(o)
                return o + jnp.pad(act, ((0, 0), (0, o.shape[1] - 2)))
            return lax.fori_loop(0, _K, body, obs)

        _rep(_obs).block_until_ready()  # compile
        _t0 = _time.perf_counter()
        _rep(_obs).block_until_ready()
        extra["serving_device_exec_us_b64"] = round(
            (_time.perf_counter() - _t0) / _K * 1e6, 2)
        _one = jnp.zeros((1,), jnp.float32)
        _noop = jax.jit(lambda x: x + 1.0)
        _noop(_one).block_until_ready()
        _t0 = _time.perf_counter()
        for _ in range(_n):
            _noop(_one).block_until_ready()
        extra["serving_tunnel_roundtrip_us"] = round(
            (_time.perf_counter() - _t0) / _n * 1e6, 1)
        extra["serving_note"] = ("latency = blocked per-call through the "
                                 "tunneled device (round-trip dominated, "
                                 "drifts with tunnel state); dispatch "
                                 "throughput = pipelined; device_exec = "
                                 "chained repeat-1000 in one dispatch; "
                                 "tunnel_roundtrip = blocked 1-elem noop "
                                 "(latency ~= device_exec + roundtrip)")
    except Exception as e:  # noqa: BLE001
        extra["serving_latency_us_b64"] = f"error: {type(e).__name__}"

    # best of two: the torch-CPU measurement is sensitive to host load.
    # The ratio uses the recorded best as a floor so vs_baseline is the
    # conservative speedup, stable across rounds. Single source of truth
    # is BASELINE.json's measured block (mirrored in BASELINE.md); the
    # literal here is only the fallback for a missing/old BASELINE.json.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as f:
            RECORDED_BASELINE = float(
                json.load(f)["measured"]["torch_cpu_unicycle_steps_per_sec"])
    except Exception:  # noqa: BLE001
        RECORDED_BASELINE = 12.23
    live = max(bench_torch_baseline(), bench_torch_baseline())
    base_sps = max(live, RECORDED_BASELINE)
    extra["torch_cpu_baseline_steps_per_sec_live"] = round(live, 2)
    extra["torch_cpu_baseline_steps_per_sec_recorded"] = RECORDED_BASELINE
    print(json.dumps({
        "metric": "unicycle_train_env_steps_per_sec",
        "value": round(uni_sps, 2),
        "unit": "env_steps/sec (2 updates/step)",
        "vs_baseline": round(uni_sps / base_sps, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
