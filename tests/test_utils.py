"""Tests for the utility tier: plotting, grid search, output dirs, math
helpers, serialization, rendering, host-env adapter, logging."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlbac_tpu.config import get_config
from nlbac_tpu.train.logging import EpochLogger
from nlbac_tpu.utils import (ExperimentGrid, convert_json,
                             get_output_folder, rotate, scale_action,
                             setup_logger_kwargs, unscale_action,
                             wrap_angle)


def test_output_folder_autoincrement(tmp_path):
    p1 = get_output_folder(str(tmp_path), "unicycle")
    p2 = get_output_folder(str(tmp_path), "unicycle")
    assert p1.endswith("unicycle-run1")
    assert p2.endswith("unicycle-run2")
    kw = setup_logger_kwargs("exp", 7, data_dir=str(tmp_path))
    assert kw["output_dir"].endswith(os.path.join("exp", "exp_s7"))


def test_convert_json_on_config():
    blob = convert_json(get_config("pvtol"))
    s = json.dumps(blob)  # must be dumpable
    assert "gamma_b" in s and "0.8" in s


def test_scale_unscale_roundtrip():
    low, high = np.array([-3.5, -12.0]), np.array([3.5, 12.0])
    a = jnp.array([[0.3, -0.9]])
    scaled = scale_action(a, low, high)
    back = unscale_action(scaled, low, high)
    np.testing.assert_allclose(np.asarray(back), np.asarray(a), atol=1e-6)
    assert np.all(np.asarray(scaled) >= low) and \
        np.all(np.asarray(scaled) <= high)


def test_rotate_and_wrap():
    v = jnp.array([1.0, 0.0])
    r = rotate(v, jnp.float32(np.pi / 2))
    np.testing.assert_allclose(np.asarray(r), [0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(float(wrap_angle(jnp.float32(2.5 * np.pi))),
                               0.5 * np.pi, atol=1e-5)


def test_epoch_logger_writes_progress(tmp_path):
    lg = EpochLogger(str(tmp_path), quiet=True)
    lg.save_config({"a": 1, "nested": {"b": [1, 2]}})
    for ep in range(3):
        lg.store(reward_train=float(ep), reward_extra=2.0 * ep)
        lg.store(reward_train=float(ep + 1))
        lg.log_tabular("Episode", ep)
        lg.log_tabular("reward_train", with_min_and_max=True,
                       average_only=False)
        lg.dump_tabular()
    lg.close()
    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(os.path.join(tmp_path, "progress.txt"))
    assert len(cols["Episode"]) == 3
    np.testing.assert_allclose(cols["reward_train"], [0.5, 1.5, 2.5])
    assert "Minreward_train" in cols and "Stdreward_train" in cols
    assert os.path.exists(os.path.join(tmp_path, "config.json"))


def test_plotter_end_to_end(tmp_path):
    # two seeds of one experiment
    for seed in (0, 1):
        d = os.path.join(tmp_path, "exp", f"exp_s{seed}")
        lg = EpochLogger(d, quiet=True)
        for ep in range(5):
            lg.log_tabular("Episode", ep)
            lg.log_tabular("reward_train", ep * (seed + 1.0))
            lg.dump_tabular()
        lg.close()
    from nlbac_tpu.utils.plot import make_plots
    out = os.path.join(tmp_path, "p.png")
    make_plots([str(tmp_path)], "reward_train", "Episode", 1, out)
    assert os.path.getsize(out) > 1000


def test_experiment_grid_variants():
    g = ExperimentGrid("sweep", base="unicycle")
    g.add("constraint.gamma_b", [20.0, 50.0])
    g.add("sac.batch_size", [128, 256])
    g.add("run.seed", 7)  # single value -> not in names
    variants = list(g.variant_configs())
    assert len(variants) == 4
    names = [n for n, _ in variants]
    assert len(set(names)) == 4
    assert all("see" not in n for n in names)
    cfgs = {n: c for n, c in variants}
    assert any(c.constraint.gamma_b == 20.0 and c.sac.batch_size == 256
               for c in cfgs.values())
    assert all(c.run.seed == 7 for c in cfgs.values())
    with pytest.raises(TypeError):
        g.add("constraint.not_a_field", [1])


def test_render_frames():
    from nlbac_tpu.envs.render import render
    f = render("unicycle", np.array([0.0, 0.0, 1.0]),
               trajectory=np.array([[0, 0, 0], [0.1, 0.1, 0.5]]))
    assert f.ndim == 3 and f.shape[2] == 3 and f.dtype == np.uint8
    f2 = render("pvtol", np.array([0.0, 0.0, 0.1, 0, 0, 1.0, -0.5]))
    assert f2.shape[2] == 3
    f3 = render("cars", np.arange(10, dtype=float))
    assert f3.shape[2] == 3
    # evaluate.py tracks states in a padded 12-wide buffer — the cars
    # renderer must ignore the trailing pad (it once IndexError'd)
    f4 = render("cars", np.concatenate([np.arange(10.0), np.zeros(2)]))
    assert f4.shape[2] == 3
    with pytest.raises(ValueError):
        render("nope", None)


def test_save_video_gif_and_fallback(tmp_path):
    from nlbac_tpu.envs.render import save_video
    frames = [np.zeros((40, 60, 3), np.uint8) for _ in range(3)]
    # .gif goes through the pillow writer and returns the same path
    gif = save_video(frames, str(tmp_path / "clip.gif"), fps=5)
    assert gif.endswith("clip.gif") and os.path.getsize(gif) > 0
    # .mp4 writes directly where ffmpeg exists, and degrades to a .gif
    # next to it on encoder-less hosts (like this image) — either way a
    # single-file artifact lands beside the requested path
    out = save_video(frames, str(tmp_path / "clip2.mp4"), fps=5)
    assert out in (str(tmp_path / "clip2.mp4"), str(tmp_path / "clip2.gif"))
    assert os.path.getsize(out) > 0


class _ToyHostEnv:
    """Host-side env implementing the reference's extended step API."""

    def __init__(self):
        self.x = 0.0
        self.steps = 0

    def reset(self):
        self.x = 0.0
        self.steps = 0
        return np.array([self.x, 0.0], np.float32)

    def step(self, action):
        self.x += float(action[0]) * 0.1
        self.steps += 1
        done = self.steps >= 5
        info = {"num_safety_violation": int(self.x > 0.3),
                "safety_cost": max(0.0, self.x - 0.3)}
        lyap = np.array([self.x], np.float32)
        return (np.array([self.x, float(self.steps)], np.float32),
                -abs(self.x - 1.0), abs(self.x - 1.0), lyap, lyap, done,
                info)


def test_host_env_adapter_under_jit():
    from nlbac_tpu.envs.base import EnvSpec
    from nlbac_tpu.envs.host_adapter import HostEnvAdapter
    spec = EnvSpec(name="toy", obs_dim=2, action_dim=1, state_dim=2,
                   lyap_dim=1, dt=0.1, max_episode_steps=5,
                   action_low=(-1.0,), action_high=(1.0,))
    adapter = HostEnvAdapter(_ToyHostEnv(), spec)
    state, obs = adapter.reset(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(obs), [0.0, 0.0])

    @jax.jit
    def roll(state):
        def body(c, _):
            st, total = c
            st, out = adapter.step(st, jnp.array([1.0]))
            return (st, total + out.reward), out.done
        (st, total), dones = jax.lax.scan(body, (state, jnp.float32(0)),
                                          None, length=5)
        return total, dones

    total, dones = roll(state)
    assert bool(dones[-1]) and not bool(dones[0])
    assert float(total) < 0


def test_host_env_full_training_loop():
    """Train end-to-end against a HOST environment through the fused
    episode loop (the safe-control-gym integration path): env physics on
    the host via io_callback, learned barrier in 'identity' obs space."""
    import dataclasses
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import (ConstraintConfig, EnvConfig, NodeConfig,
                                  ReplayConfig, SacConfig,
                                  SupervisorConfig, get_config)
    from nlbac_tpu.envs.base import EnvSpec
    from nlbac_tpu.envs.host_adapter import HostEnvAdapter
    from nlbac_tpu.train.driver import create_replays, make_episode_runner

    class HostPointMass:
        """Host-side 1-D point mass with the extended step API (with a
        barrier signal field, like the NBC variants)."""

        def __init__(self):
            self.x = np.zeros(2, np.float32)  # [pos, vel]
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
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg, env_override=adapter)
    run = jax.jit(make_episode_runner(cfg, env_override=adapter))
    total = jnp.int32(0)
    for ep in range(2):
        ts, rl, node, m, total = run(ts, rl, node, jax.random.PRNGKey(ep),
                                     jnp.int32(ep), total)
    assert int(m.steps) == 8
    assert int(m.updates_done) > 0
    assert np.isfinite(float(m.reward))
    assert int(node.size) == int(total) == 16


def test_quadrotor_renderer():
    from nlbac_tpu.envs.render import render
    f = render("quadrotor", np.array([-1.0, 0, 0.5, 0, 0.1, 0]),
               trajectory=np.array([[-1, 0, 0.5, 0, 0, 0],
                                    [-0.9, 0, 0.6, 0, 0, 0]]))
    assert f.ndim == 3 and f.shape[2] == 3


def test_experiment_grid_run_all(tmp_path):
    """run_all executes every variant in-process through the training
    loop (the call_experiment successor)."""
    import dataclasses
    from nlbac_tpu.config import NodeConfig, ReplayConfig, get_config
    base = get_config("unicycle")
    base = dataclasses.replace(
        base,
        env=dataclasses.replace(base.env, max_episode_steps=6),
        sac=dataclasses.replace(base.sac, hidden_dim=8, batch_size=4,
                                updates_per_step=1, start_steps=2),
        node=dataclasses.replace(base.node, hidden_dim=8,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 max_batch=8, update_interval=2),
        replay=ReplayConfig(capacity=32, node_capacity=32),
        run=dataclasses.replace(base.run, max_episodes=1),
    )
    g = ExperimentGrid("mini", base=base)
    g.add("constraint.gamma_b", [10.0, 50.0])
    results = g.run_all(output_dir=str(tmp_path))
    assert len(results) == 2
    for name in results:
        assert os.path.exists(os.path.join(tmp_path, name,
                                           "progress.txt")), name


def test_export_policy_roundtrip(tmp_path):
    """export_policy: the serialized deterministic head reproduces the
    in-process head bit-close at MULTIPLE batch sizes (symbolic batch
    dim), the stochastic head samples in-bounds, and the manifest
    self-describes the artifact."""
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.utils.export_policy import (export_policy, load_policy,
                                               make_policy_fn)

    cfg = get_config("unicycle")
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "policy.nlbac")
    export_policy(cfg, ts, path)
    fn, man = load_policy(path)
    assert man["format"] == "nlbac-policy-export-v1"
    assert (man["obs_dim"], man["action_dim"]) == (7, 2)
    ref_fn = make_policy_fn(cfg, ts)
    for B in (1, 5, 64):
        obs = np.random.RandomState(B).randn(B, 7).astype(np.float32)
        np.testing.assert_allclose(np.asarray(fn(obs)),
                                   np.asarray(ref_fn(jnp.asarray(obs))),
                                   rtol=1e-6, atol=1e-6)
    # stochastic head: takes a key, stays inside the action bounds
    spath = str(tmp_path / "policy_s.nlbac")
    export_policy(cfg, ts, spath, deterministic=False)
    sfn, sman = load_policy(spath)
    assert sman["deterministic"] is False
    a = np.asarray(sfn(np.zeros((8, 7), np.float32), jax.random.PRNGKey(1)))
    assert a.shape == (8, 2) and np.isfinite(a).all()
    from nlbac_tpu.envs import get_env
    lo = np.asarray(get_env("unicycle").SPEC.action_low)
    hi = np.asarray(get_env("unicycle").SPEC.action_high)
    assert (a >= lo - 1e-6).all() and (a <= hi + 1e-6).all()


def test_export_policy_framework_free_serving(tmp_path):
    """The deployment claim, proven: a subprocess that imports ONLY jax
    (no nlbac_tpu on its path) deserializes and serves the artifact."""
    import subprocess
    import sys

    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.utils.export_policy import export_policy, make_policy_fn

    cfg = get_config("unicycle")
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "policy.nlbac")
    export_policy(cfg, ts, path)
    obs = np.random.RandomState(0).randn(3, 7).astype(np.float32)
    np.save(str(tmp_path / "obs.npy"), obs)
    script = (
        "import sys\n"
        # serving environment: no repo / package on the path
        "sys.path = [p for p in sys.path if 'repo' not in p]\n"
        "import jax, numpy as np\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"blob = open({path!r}, 'rb').read()\n"
        "exported = jax.export.deserialize(blob)\n"
        "act = jax.jit(exported.call)\n"
        f"obs = np.load({str(tmp_path / 'obs.npy')!r})\n"
        "a = np.asarray(act(obs))\n"
        "assert a.shape == (3, 2), a.shape\n"
        f"np.save({str(tmp_path / 'a.npy')!r}, a)\n"
        "print('served OK')\n")
    out = subprocess.run([sys.executable, "-c", script], cwd=str(tmp_path),
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "served OK" in out.stdout
    served = np.load(str(tmp_path / "a.npy"))
    ref = np.asarray(make_policy_fn(cfg, ts)(jnp.asarray(obs)))
    np.testing.assert_allclose(served, ref, rtol=1e-6, atol=1e-6)


def test_export_policy_cli(tmp_path):
    """export_policy.main: exports from a save_model_weights run dir."""
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.train.checkpoint import save_model_weights
    from nlbac_tpu.utils.export_policy import load_policy
    from nlbac_tpu.utils.export_policy import main as export_main

    cfg = get_config("unicycle")
    ts = create_train_state(cfg, jax.random.PRNGKey(3))
    run_dir = str(tmp_path / "run")
    save_model_weights(run_dir, ts)
    export_main([run_dir, "--preset", "unicycle"])
    fn, man = load_policy(os.path.join(run_dir, "policy.nlbac"))
    a = np.asarray(fn(np.zeros((2, 7), np.float32)))
    assert a.shape == (2, 2) and np.isfinite(a).all()
