"""Native host data-plane tests: builds runtime/libnlbac_host.so on first
use and checks ring-buffer + TSV semantics against the Python twins."""

import os

import numpy as np
import pytest

from nlbac_tpu import runtime_native as rn

pytestmark = pytest.mark.skipif(not rn.native_available(),
                                reason="no C++ toolchain")


def test_ring_buffer_push_sample():
    buf = rn.HostReplay(capacity=8, record_size=3, seed=1)
    for i in range(5):
        buf.push(np.array([i, i + 0.5, i + 0.25], np.float32))
    assert len(buf) == 5 and buf.total == 5
    s = buf.sample(64)
    assert s.shape == (64, 3)
    assert np.all(s[:, 0] < 5)
    np.testing.assert_allclose(s[:, 1] - s[:, 0], 0.5)


def test_ring_buffer_wraparound():
    buf = rn.HostReplay(capacity=4, record_size=1, seed=2)
    buf.push_many(np.arange(6, dtype=np.float32)[:, None])
    assert len(buf) == 4 and buf.total == 6
    s = buf.sample(256)
    vals = np.unique(s)
    assert set(vals.tolist()) <= {2.0, 3.0, 4.0, 5.0}


def test_ring_buffer_bounded_sampling():
    buf = rn.HostReplay(capacity=64, record_size=1, seed=3)
    buf.push_many(np.arange(50, dtype=np.float32)[:, None])
    s = buf.sample(256, max_index=5)
    assert np.all(s < 5)


def test_empty_buffer_samples_zeros():
    buf = rn.HostReplay(capacity=8, record_size=2, seed=4)
    s = buf.sample(4)
    np.testing.assert_allclose(s, 0.0)


def test_tsv_writer_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "progress.txt")
    w = rn.NativeTsvWriter(path)
    w.header(["Episode", "reward"])
    for i in range(100):
        w.row([float(i), i * 2.0])
    w.close()
    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(path)
    assert len(cols["Episode"]) == 100
    np.testing.assert_allclose(cols["reward"], 2.0 * np.arange(100))


def test_throughput_sane():
    """Native pushes should handle >=1e5 records/sec easily."""
    import time
    buf = rn.HostReplay(capacity=100_000, record_size=32, seed=5)
    recs = np.random.randn(50_000, 32).astype(np.float32)
    t0 = time.perf_counter()
    buf.push_many(recs)
    dt = time.perf_counter() - t0
    assert dt < 2.0, dt
    assert buf.total == 50_000


def test_epoch_logger_native_backend(tmp_path):
    """The EpochLogger's native TSV backend (the product consumer of
    NativeTsvWriter) writes the same rows as the Python backend and is
    selected automatically when the library is available."""
    import numpy as np

    from nlbac_tpu.train.logging import EpochLogger

    rows = [dict(Episode=i, reward_train=-61.0013 + i * 0.5,
                 qf1_loss=1.55059, updates=54 + i) for i in range(5)]
    # f32-dirty doubles: these sit within f32-epsilon of a 6th-
    # significant-digit %.6g rounding boundary, so an f32 round-trip in
    # the native path would print a DIFFERENT row than the Python
    # f-string backend (59974.8 vs 59974.9) — regression for the
    # float64-end-to-end TSV channel
    rows.append(dict(Episode=5, reward_train=59974.849999999999,
                     qf1_loss=7117.204999999999, updates=59))
    outs = {}
    for backend in ("native", "python"):
        d = tmp_path / backend
        lg = EpochLogger(str(d), backend=backend)
        assert (lg._native is not None) == (backend == "native")
        for r in rows:
            lg.store(**r)
            for k in r:
                lg.log_tabular(k)
            lg.dump_tabular()
        lg.close()
        outs[backend] = (d / "progress.txt").read_text()
    assert outs["native"] == outs["python"]
    # auto mode picks native when the lib is importable
    lg = EpochLogger(str(tmp_path / "auto"))
    assert lg._native is not None
    lg.close()
    # parses through the standard loader
    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(str(tmp_path / "native" / "progress.txt"))
    np.testing.assert_allclose(cols["updates"], [54, 55, 56, 57, 58, 59])


def test_host_loop_training_native_data_plane(tmp_path):
    """End-to-end host-loop training (train/host_loop.py): host env
    physics + NATIVE C++ replay rings + device updates. The product
    consumer of HostReplay."""
    import dataclasses

    import numpy as np

    from nlbac_tpu.config import (ConstraintConfig, EnvConfig, NodeConfig,
                                  ReplayConfig, SupervisorConfig,
                                  get_config)
    from nlbac_tpu.envs.base import EnvSpec
    from nlbac_tpu.envs.host_adapter import HostEnvAdapter
    from nlbac_tpu.train.host_loop import train_host_env
    from nlbac_tpu.train.logging import EpochLogger

    class HostPointMass:
        def __init__(self):
            self.x = np.zeros(2, np.float32)
            self.steps = 0

        def reset(self):
            self.x = np.zeros(2, np.float32)
            self.steps = 0
            return self.x.copy()

        def step(self, a):
            self.x[1] += 0.1 * float(a[0])
            self.x[0] += 0.1 * self.x[1]
            self.steps += 1
            done = self.steps >= 8
            barrier = -1.0 if abs(self.x[0]) > 0.5 else 0.0
            lyap = self.x.copy()
            info = {"num_safety_violation": int(barrier < 0),
                    "safety_cost": max(0.0, abs(self.x[0]) - 0.5)}
            return (self.x.copy(), -abs(self.x[0] - 0.3),
                    abs(self.x[0] - 0.3), barrier, lyap, lyap, done, info)

    spec = EnvSpec(name="identity", obs_dim=2, action_dim=1, state_dim=2,
                   lyap_dim=2, dt=0.1, max_episode_steps=8,
                   action_low=(-1.0,), action_high=(1.0,))
    adapter = HostEnvAdapter(HostPointMass(), spec,
                             has_barrier_signal=True)
    cfg = get_config("nbc_unicycle")
    cfg = dataclasses.replace(
        cfg,
        env=EnvConfig(name="identity", dt=0.1, max_episode_steps=8,
                      barrier_signals=True),
        sac=dataclasses.replace(cfg.sac, hidden_dim=8, batch_size=4,
                                updates_per_step=1, start_steps=4),
        node=NodeConfig(form="mlp", state_dim=2, action_dim=1,
                        hidden_dim=8, mlp_hidden_layers=1, max_batch=8,
                        update_interval=2),
        constraint=dataclasses.replace(cfg.constraint, use_backup=False),
        supervisor=SupervisorConfig(kind="none"),
        replay=ReplayConfig(capacity=64, node_capacity=64),
        obs_dim=2, action_dim=1, lyap_dim=2,
    )
    logger = EpochLogger(str(tmp_path), quiet=True)
    ts, history = train_host_env(cfg, adapter, episodes=3, seed=0,
                                 logger=logger)
    logger.close()
    assert len(history) == 3
    assert history[-1]["updates"] > 0
    assert all(np.isfinite(h["reward_train"]) for h in history)
    assert np.isfinite(history[-1]["qf1_loss"])
    # progress.txt written through the (native-backed) EpochLogger
    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(str(tmp_path / "progress.txt"))
    assert len(cols["Episode"]) == 3
    # loud rejection of the invalid combo (same rule as the device
    # driver): a supervisor with no trained backup controller
    import pytest

    bad = dataclasses.replace(
        cfg, supervisor=SupervisorConfig(kind="trap"),
        constraint=dataclasses.replace(cfg.constraint, use_backup=False))
    with pytest.raises(ValueError, match="never trained"):
        train_host_env(bad, adapter, episodes=1)


def _host_loop_cfg_and_adapter(max_steps=8, batch_size=4, start_steps=4,
                               update_interval=2, fit_episode_limit=None,
                               env_cls=None):
    """Shared tiny host-loop fixture (the point-mass from the e2e test)."""
    import dataclasses

    from nlbac_tpu.config import (EnvConfig, NodeConfig, ReplayConfig,
                                  SupervisorConfig, get_config)
    from nlbac_tpu.envs.base import EnvSpec
    from nlbac_tpu.envs.host_adapter import HostEnvAdapter

    class HostPointMass:
        def __init__(self):
            self.x = np.zeros(2, np.float32)
            self.steps = 0

        def reset(self):
            self.x = np.zeros(2, np.float32)
            self.steps = 0
            return self.x.copy()

        def step(self, a):
            self.x[1] += 0.1 * float(a[0])
            self.x[0] += 0.1 * self.x[1]
            self.steps += 1
            done = self.steps >= max_steps
            barrier = -1.0 if abs(self.x[0]) > 0.5 else 0.0
            lyap = self.x.copy()
            info = {"num_safety_violation": int(barrier < 0),
                    "safety_cost": max(0.0, abs(self.x[0]) - 0.5)}
            return (self.x.copy(), -abs(self.x[0] - 0.3),
                    abs(self.x[0] - 0.3), barrier, lyap, lyap, done, info)

    spec = EnvSpec(name="identity", obs_dim=2, action_dim=1, state_dim=2,
                   lyap_dim=2, dt=0.1, max_episode_steps=max_steps,
                   action_low=(-1.0,), action_high=(1.0,))
    adapter = HostEnvAdapter((env_cls or HostPointMass)(), spec,
                             has_barrier_signal=True)
    cfg = get_config("nbc_unicycle")
    cfg = dataclasses.replace(
        cfg,
        env=EnvConfig(name="identity", dt=0.1,
                      max_episode_steps=max_steps, barrier_signals=True),
        sac=dataclasses.replace(cfg.sac, hidden_dim=8,
                                batch_size=batch_size, updates_per_step=1,
                                start_steps=start_steps),
        node=NodeConfig(form="mlp", state_dim=2, action_dim=1,
                        hidden_dim=8, mlp_hidden_layers=1, max_batch=8,
                        update_interval=update_interval,
                        fit_episode_limit=fit_episode_limit),
        constraint=dataclasses.replace(cfg.constraint, use_backup=False),
        supervisor=SupervisorConfig(kind="none"),
        replay=ReplayConfig(capacity=64, node_capacity=64),
        obs_dim=2, action_dim=1, lyap_dim=2,
    )
    return cfg, adapter


def test_host_loop_headers_survive_warmup_episode(tmp_path):
    """EpochLogger freezes progress.txt headers on the first
    dump_tabular; an episode 0 that ends before the replay exceeds
    batch_size must still emit the loss columns (zeros, matching the
    device driver's _zero_train_metrics) or every later loss value is
    silently dropped from progress.txt."""
    from nlbac_tpu.train.host_loop import train_host_env
    from nlbac_tpu.train.logging import EpochLogger
    from nlbac_tpu.utils.plot import load_progress

    # batch_size 16 > 8 steps: episode 0 finishes with zero updates
    cfg, adapter = _host_loop_cfg_and_adapter(max_steps=8, batch_size=16,
                                              start_steps=4)
    logger = EpochLogger(str(tmp_path), quiet=True)
    ts, history = train_host_env(cfg, adapter, episodes=4, seed=0,
                                 logger=logger)
    logger.close()
    assert history[0]["updates"] == 0  # the warm-up premise holds
    assert history[-1]["updates"] > 0
    cols = load_progress(str(tmp_path / "progress.txt"))
    assert "qf1_loss" in cols and "node_loss" in cols
    assert cols["qf1_loss"][0] == 0.0  # zero before the first update
    assert np.isfinite(cols["qf1_loss"][-1]) and cols["qf1_loss"][-1] != 0


def test_host_loop_node_replay_on_device():
    """The NODE data plane is DEVICE-resident (r5): every transition
    reaches the device NODE replay (warm-up steps included) via the
    control vector — with an episode-end flush for the final row — and
    NO host-side NODE batch is ever sampled/H2D-shipped (the host ring
    design paid ~4.6MB through the tunnel per fit-due step).  The fit
    gate itself (interval AND fit_episode_limit) lives in
    agent/update.py:277-289, shared with the fused driver."""
    from nlbac_tpu.train import host_loop as hl

    sample_calls = []
    real_replay = rn.HostReplay

    class CountingReplay(real_replay):
        def sample(self, n, max_index=0):
            sample_calls.append(n)
            return super().sample(n, max_index)

    cfg, adapter = _host_loop_cfg_and_adapter(max_steps=8, batch_size=4,
                                              start_steps=0,
                                              update_interval=1,
                                              fit_episode_limit=0)
    rings_box = {}
    orig_rings = hl.HostRings

    class SpyRings(orig_rings):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            rings_box["obj"] = self

    orig = rn.HostReplay
    rn.HostReplay = CountingReplay
    hl.HostRings = SpyRings
    try:
        _, history = hl.train_host_env(cfg, adapter, episodes=3, seed=0)
    finally:
        rn.HostReplay = orig
        hl.HostRings = orig_rings
    total = sum(h["episode_steps"] for h in history)
    # every transition landed in the DEVICE node replay
    assert int(rings_box["obj"].node_replay.size) == total
    # the only host samples are the (U*B)-row RL gathers — never the
    # node fit batch (cfg.node.max_batch)
    assert sample_calls and all(
        n == cfg.sac.updates_per_step * cfg.sac.batch_size
        for n in sample_calls), sample_calls


def test_host_loop_supervisor_backup_semantics(tmp_path):
    """Backup supervision in host-loop mode: the SAME pure trap machine
    as the device program engages the backup controller, backup-active
    transitions skip the RL ring but always reach the NODE ring
    (UNI/main.py:96-104), and the backup branch of update_from_batch
    trains (learned_barrier NUM_BACKUP=1)."""
    import dataclasses

    from nlbac_tpu.config import SupervisorConfig
    from nlbac_tpu.train import host_loop as hl
    from nlbac_tpu.train.host_loop import train_host_env

    cfg, adapter = _host_loop_cfg_and_adapter(max_steps=8, batch_size=4,
                                              start_steps=0)
    # aggressive trap knobs so the machine fires within an 8-step
    # episode: always "trapped" (huge threshold), 2 consecutive checks,
    # 3-step backup timeout, never escapes by distance
    cfg = dataclasses.replace(
        cfg,
        constraint=dataclasses.replace(cfg.constraint, use_backup=True),
        supervisor=SupervisorConfig(
            kind="trap", enable_after_episodes=1, window=4, min_steps=2,
            trap_threshold=100.0, trap_count=2, backup_max_steps=3,
            escape_distance_sq=1e9),
    )

    ring_sizes = {}
    real_rings = hl.HostRings

    class SpyRings(real_rings):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            ring_sizes["obj"] = self

    hl.HostRings = SpyRings
    try:
        ts, history = train_host_env(cfg, adapter, episodes=3, seed=0)
    finally:
        hl.HostRings = real_rings

    # episode 0 is below enable_after_episodes: no backup engagement
    assert history[0]["backup_steps"] == 0
    # once enabled, the trap machine (always trapped here) must engage
    engaged = sum(h["backup_steps"] for h in history[1:])
    assert engaged > 0, "trap supervisor never engaged the backup"
    # RL ring skipped the backup-active steps; the DEVICE node replay
    # got every step (UNI/main.py:96-104)
    rings = ring_sizes["obj"]
    total = sum(h["episode_steps"] for h in history)
    assert int(rings.node_replay.size) == total
    assert rings.rl.size == total - engaged
    # training still ran (updates gate uses the RL ring)
    assert history[-1]["updates"] > 0


def test_host_loop_real_preset_via_shim(tmp_path):
    """The host-loop architecture drives a REAL preset: as_host_env
    wraps the pure-JAX unicycle module in the reference's host gym API
    (envs/host_shim.py), and train_host_env runs the unmodified
    unicycle constraint stack (CBF/CLF builder, trap supervisor wired,
    obs->NODE-state adapter forwarded) — not just toy point-mass envs."""
    import dataclasses

    from nlbac_tpu.config import ReplayConfig, get_config
    from nlbac_tpu.envs import as_host_env, unicycle
    from nlbac_tpu.train.host_loop import train_host_env

    cfg = get_config("unicycle")
    cfg = dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, max_episode_steps=40),
        sac=dataclasses.replace(cfg.sac, start_steps=20, batch_size=32),
        replay=ReplayConfig(capacity=4096, node_capacity=4096),
    )
    adapter = as_host_env(unicycle, seed=9, max_episode_steps=40)
    # the NODE adapter really forwarded (identity would feed 7-d obs
    # into the 3-d NODE and crash the update); pvtol gets its special
    # obs_to_dynamics_state (the registry path's make_agent rule)
    assert adapter.obs_to_state is unicycle.obs_to_state
    from nlbac_tpu.envs import pvtol
    assert (as_host_env(pvtol).obs_to_state
            is pvtol.obs_to_dynamics_state)
    ts, history = train_host_env(cfg, adapter, episodes=2, seed=9)
    assert history[-1]["updates"] > 0
    assert np.isfinite(history[-1]["qf1_loss"])
    assert all(h["episode_steps"] <= 40 for h in history)


def test_as_host_env_forwards_step_kwargs():
    """step_kwargs (the driver's opt-in kill semantics,
    train/driver.build_step_kwargs) are baked into the shim's jitted
    step: a saturated-differential-thrust tumble terminates under
    kill_attitude through the host gym API exactly as it does in the
    raw env module, while the kwarg-less shim keeps flying."""
    import jax.numpy as jnp

    from nlbac_tpu.envs import as_host_env, quadrotor as quad

    a_spin = np.concatenate([np.asarray(quad.SPEC.action_low[:1]),
                             np.asarray(quad.SPEC.action_high[1:])])
    limit = float(jnp.pi / 2)
    killed = as_host_env(quad, seed=3,
                         step_kwargs={"kill_attitude": limit,
                                      "kill_penalty": 250.0})
    plain = as_host_env(quad, seed=3)
    killed.host_reset(), plain.host_reset()
    done_k = done_p = None
    for i in range(200):
        if done_k is None:
            out = killed.host_step(a_spin)
            if bool(out[6]):
                done_k = i
                # terminal step collects the kill penalty
                assert float(out[1]) < -200.0
        if done_p is None and bool(plain.host_step(a_spin)[6]):
            done_p = i
        if done_k is not None and done_p is not None:
            break
    # the attitude kill fires long before the plain env's position box
    assert done_k is not None and (done_p is None or done_k < done_p)


def test_host_loop_checkpoint_resume_bitexact(tmp_path):
    """Host-loop durability (VERDICT r4 item 3 stretch): a run
    checkpointed at episode 1 and resumed reproduces the uninterrupted
    run bit-for-bit — train state, metrics rows, and the native rings'
    sampler stream all restore (runtime/host_buffer.cpp rb_snapshot/
    rb_restore; the fold_in RNG scheme needs only the counters)."""
    import jax

    from nlbac_tpu.train import host_loop as hl

    ck = str(tmp_path / "ck.npz")
    cfg, adapter = _host_loop_cfg_and_adapter(max_steps=8, batch_size=4,
                                              start_steps=0)
    ts_a, hist_a = hl.train_host_env(cfg, adapter, episodes=4, seed=3)

    cfg2, adapter2 = _host_loop_cfg_and_adapter(max_steps=8, batch_size=4,
                                                start_steps=0)
    # save_every = max(1, 2 // 2) = 1 -> checkpoint lands at episode 1
    hl.train_host_env(cfg2, adapter2, episodes=2, seed=3,
                      checkpoint_path=ck)
    assert os.path.exists(ck)

    cfg3, adapter3 = _host_loop_cfg_and_adapter(max_steps=8, batch_size=4,
                                                start_steps=0)
    ts_b, hist_b = hl.train_host_env(cfg3, adapter3, episodes=4, seed=3,
                                     resume_path=ck)
    assert [r["Episode"] for r in hist_b] == [2, 3]
    for ra, rb in zip(hist_a[2:], hist_b):
        for k in ra:
            if k != "wall_s":
                assert ra[k] == rb[k], (k, ra[k], rb[k])
    for la, lb in zip(jax.tree.leaves(ts_a), jax.tree.leaves(ts_b)):
        assert np.array_equal(np.asarray(la), np.asarray(lb))


def test_host_loop_sink_and_midrun_saves(tmp_path):
    """Host-loop observability: the reference's wandb-channel metric
    dict reaches the sink every episode (UNI/main.py:157-165) and
    reference-layout weights + the full checkpoint are written MID-RUN
    at the max_episodes/save_every_fraction cadence (UNI/main.py:
    153-154) — not only at the end."""
    from nlbac_tpu.train import host_loop as hl
    from nlbac_tpu.train.logging import MetricsSink

    cfg, adapter = _host_loop_cfg_and_adapter(max_steps=8, batch_size=4,
                                              start_steps=0)
    sink = MetricsSink(logger=None)
    wdir = str(tmp_path / "w")
    ck = str(tmp_path / "ck.npz")

    seen = []

    def spy(i_episode, ts, row):
        # cadence save_every = max(1, 4 // 2) = 2 -> episodes 0, 2, 3
        seen.append((i_episode, os.path.exists(
            os.path.join(wdir, "actor.pkl")), os.path.exists(ck)))

    hl.train_host_env(cfg, adapter, episodes=4, seed=0, sink=sink,
                      weights_dir=wdir, checkpoint_path=ck,
                      on_episode_end=spy)
    assert len(sink.history) == 4
    assert {"Episode Reward", "Episode Length", "Episode Safety Cost",
            "Episode Number of Safety Violations",
            "Cumulated Number of steps"} <= set(sink.history[0])
    # weights existed already after episode 0 (mid-run, not final-only)
    assert seen[0][1], "no mid-run weight save at episode 0"
    assert os.path.exists(os.path.join(wdir, "node_model.pkl"))
    assert os.path.exists(ck)


def test_host_loop_rejects_zero_updates_per_step():
    """updates_per_step=0 fails as a clean config error, not a
    mid-episode NameError (advisor r4)."""
    import dataclasses

    from nlbac_tpu.train import host_loop as hl

    cfg, adapter = _host_loop_cfg_and_adapter()
    cfg = dataclasses.replace(
        cfg, sac=dataclasses.replace(cfg.sac, updates_per_step=0))
    with pytest.raises(ValueError, match="updates_per_step"):
        hl.train_host_env(cfg, adapter, episodes=1, seed=0)


def test_stale_native_lib_rebuilds(tmp_path):
    """A prebuilt libnlbac_host.so from BEFORE a C-ABI addition (the
    .so is untracked) must not crash consumers with a raw
    missing-symbol AttributeError: _load rebuilds via make and binds
    the fresh library through a temp path (dlopen caches by path, so
    re-loading the original path would return the stale image)."""
    import shutil
    import subprocess
    import sys
    import textwrap

    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no g++ toolchain")
    from nlbac_tpu import runtime_native as rn

    # a stale stub: the pre-r5 symbol surface (everything _bind touches
    # BEFORE rb_snapshot), bodies never called after the rebuild
    stub = tmp_path / "stale.cpp"
    stub.write_text(textwrap.dedent("""
        #include <cstdint>
        extern "C" {
        void* rb_create(int64_t, int64_t, uint64_t) { return nullptr; }
        void rb_destroy(void*) {}
        void rb_push(void*, const float*) {}
        void rb_push_many(void*, const float*, int64_t) {}
        void rb_sample(void*, int64_t, int64_t, float*) {}
        int64_t rb_size(void*) { return 0; }
        int64_t rb_total(void*) { return 0; }
        }
    """))
    lib_path = rn._LIB_PATH
    backup = tmp_path / "real.so"
    shutil.copy2(lib_path, backup)
    try:
        subprocess.run([gxx, "-O1", "-std=c++17", "-fPIC", "-shared",
                        "-o", lib_path, str(stub)], check=True)
        # fresh process: this one may already hold the good dlopen image
        r = subprocess.run(
            [sys.executable, "-c",
             "from nlbac_tpu import runtime_native as rn\n"
             "import numpy as np\n"
             "assert rn.native_available()\n"
             "h = rn.HostReplay(4, 2, seed=0)\n"
             "h.push(np.ones(2, np.float32))\n"
             "d, m = h.snapshot()\n"
             "assert d.shape == (4, 2) and m.shape == (5,)\n"
             "print('REBUILT-OK')\n"],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(rn.__file__))))
        assert "REBUILT-OK" in r.stdout, (r.stdout, r.stderr[-1500:])
    finally:
        # the subprocess rebuilt it from source; restore the backup
        # anyway in case the toolchain misbehaved
        if not os.path.exists(lib_path):
            shutil.copy2(backup, lib_path)
