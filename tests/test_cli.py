"""CLI integration: config-from-args mapping and a tiny end-to-end
train() producing progress.txt, config.json, weights, and a resumable
checkpoint."""

import dataclasses
import os

import numpy as np

from nlbac_tpu.config import ReplayConfig
from nlbac_tpu.train.cli import build_parser, config_from_args, train


def test_config_from_args_mapping():
    args = build_parser().parse_args([
        "--preset", "cars", "--gamma_b", "0.7", "--batch_size", "64",
        "--lr", "1e-4", "--NODE_model_update_interval", "5",
        "--Lagrangian_multiplier_update_interval", "4",
        "--max_episodes", "7", "--seed", "3", "--policy", "Deterministic",
    ])
    cfg = config_from_args(args)
    assert cfg.env.name == "cars"
    assert cfg.constraint.gamma_b == 0.7
    assert cfg.sac.batch_size == 64
    assert cfg.sac.policy_lr == 1e-4
    assert cfg.sac.policy_type == "deterministic"
    assert cfg.node.update_interval == 5
    assert cfg.constraint.lambda_update_interval == 4
    assert cfg.run.max_episodes == 7
    assert cfg.run.seed == 3
    # untouched fields keep preset values
    assert cfg.constraint.horizon == 2
    assert cfg.node.time_input
    # default: physically-consistent NODE times; flag restores reference's
    assert not cfg.node.reference_time_labels
    args2 = build_parser().parse_args(["--preset", "cars",
                                       "--reference_time_labels"])
    assert config_from_args(args2).node.reference_time_labels


def test_train_writes_all_artifacts(tmp_path):
    args = build_parser().parse_args([
        "--preset", "unicycle", "--max_episodes", "2",
        "--max_episode_steps", "12", "--batch_size", "4",
        "--start_steps", "4", "--hidden_size", "16",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        node=dataclasses.replace(cfg.node, hidden_dim=8,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 max_batch=8, update_interval=2),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    out = str(tmp_path / "run")
    train(cfg, output_dir=out, quiet=True)

    for f in ("progress.txt", "config.json", "actor.pkl", "critic.pkl",
              "lyapunov.pkl", "node_model.pkl", "checkpoint.npz"):
        assert os.path.exists(os.path.join(out, f)), f

    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(os.path.join(out, "progress.txt"))
    assert len(cols["Episode"]) == 2
    assert np.all(np.isfinite(cols["reward_train"]))
    assert np.all(cols["episode_steps"] <= 12)


def test_multi_seed_pipelined_matches_sequential(tmp_path):
    """The pipelined --n_seeds loop (dispatch episode i, then fetch and
    process episode i-1 — measured 1.48x on TPU) writes the SAME
    progress.txt rows as the fully sequential order (--save_best forces
    sequential), and cadence weight saves still snapshot post-cadence
    states."""
    from nlbac_tpu.train.cli import train_multi_seed

    args = build_parser().parse_args([
        "--preset", "unicycle", "--max_episodes", "4",
        "--max_episode_steps", "10", "--batch_size", "4",
        "--start_steps", "4", "--hidden_size", "16", "--seed", "21",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        node=dataclasses.replace(cfg.node, hidden_dim=8,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 max_batch=8, update_interval=2),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    outs = {}
    for mode in ("pipelined", "sequential"):
        cfg_m = cfg if mode == "pipelined" else dataclasses.replace(
            cfg, run=dataclasses.replace(cfg.run,
                                         save_best_metric="reward",
                                         save_best_window=2))
        out = str(tmp_path / mode)
        train_multi_seed(cfg_m, n_seeds=2, output_root=out, quiet=True)
        outs[mode] = {
            s: open(os.path.join(out, f"s{s}", "progress.txt")).read()
            for s in (21, 22)}
    assert outs["pipelined"] == outs["sequential"]
    # cadence weight files exist in the pipelined run
    for s in (21, 22):
        assert os.path.exists(
            os.path.join(tmp_path, "pipelined", f"s{s}", "actor.pkl"))


def test_train_dp_mode(tmp_path):
    """--dp through the real training loop: train(cfg, dp=8) on the
    8-device CPU mesh writes the same artifacts as dp=1, performs
    updates, and (loud-failure) rejects flag misuse in main()."""
    args = build_parser().parse_args([
        "--preset", "unicycle", "--max_episodes", "2",
        "--max_episode_steps", "12", "--batch_size", "8",
        "--start_steps", "4", "--hidden_size", "16", "--dp", "8",
    ])
    assert args.dp == 8
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        node=dataclasses.replace(cfg.node, hidden_dim=8,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 max_batch=8, update_interval=2),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    out = str(tmp_path / "dprun")
    train(cfg, output_dir=out, quiet=True, dp=8)
    for f in ("progress.txt", "config.json", "actor.pkl",
              "checkpoint.npz"):
        assert os.path.exists(os.path.join(out, f)), f
    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(os.path.join(out, "progress.txt"))
    assert len(cols["Episode"]) == 2
    assert cols["updates"][-1] > 0  # the dp-sharded update really ran
    assert np.all(np.isfinite(cols["qf1_loss"]))

    # loud failures: eval mode and multi-process flag validation
    import pytest

    from nlbac_tpu.train.cli import main
    with pytest.raises(SystemExit, match="training flags"):
        main(["--preset", "unicycle", "--mode", "eval", "--dp", "2",
              "--output", out])
    with pytest.raises(SystemExit, match="coordinator"):
        main(["--preset", "unicycle", "--num_processes", "2"])


def test_train_tp_mode(tmp_path):
    """--tp through the real training loop, composed with --dp: a dp=2 x
    tp=2 run on the 8-device CPU mesh (Megatron layout: batches sharded
    over 'dp', params over 'tp') writes the same artifacts as a plain run
    and performs updates; flag misuse fails loudly."""
    args = build_parser().parse_args([
        "--preset", "unicycle", "--max_episodes", "2",
        "--max_episode_steps", "12", "--batch_size", "8",
        "--start_steps", "4", "--hidden_size", "16",
        "--dp", "2", "--tp", "2",
    ])
    assert args.tp == 2
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        node=dataclasses.replace(cfg.node, hidden_dim=8,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 max_batch=8, update_interval=2),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    out = str(tmp_path / "tprun")
    train(cfg, output_dir=out, quiet=True, dp=2, tp=2)
    for f in ("progress.txt", "config.json", "actor.pkl",
              "checkpoint.npz"):
        assert os.path.exists(os.path.join(out, f)), f
    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(os.path.join(out, "progress.txt"))
    assert len(cols["Episode"]) == 2
    assert cols["updates"][-1] > 0
    assert np.all(np.isfinite(cols["qf1_loss"]))

    # loud failures: eval mode, device budget, nonsense widths
    import pytest

    from nlbac_tpu.train.cli import main
    with pytest.raises(SystemExit, match="training flags"):
        main(["--preset", "unicycle", "--mode", "eval", "--tp", "2",
              "--output", out])
    with pytest.raises(SystemExit, match="needs"):
        main(["--preset", "unicycle", "--dp", "4", "--tp", "4"])
    with pytest.raises(SystemExit, match=">= 1"):
        main(["--preset", "unicycle", "--tp", "0"])
    # divisibility misuse fails as clean SystemExit BEFORE any output
    # dir is made: arg-only (explicit --hidden_size, pre-init) and
    # config-level (preset default hidden 256 % 3) forms, plus dp batch
    with pytest.raises(SystemExit, match="hidden_size"):
        main(["--preset", "unicycle", "--tp", "2", "--hidden_size", "25"])
    with pytest.raises(SystemExit, match="hidden dim"):
        main(["--preset", "unicycle", "--tp", "3"])
    with pytest.raises(SystemExit, match="divisible"):
        main(["--preset", "unicycle", "--dp", "5"])


def test_multihost_flag_validation_precedes_init(monkeypatch, tmp_path):
    """Invalid multi-host flag combinations must fail loudly BEFORE
    jax.distributed.initialize — init blocks until every process joins,
    so validating after it would hang the whole gang instead of exiting.
    Also pins the --n_seeds x --num_processes rejection (the async seed
    runner lays seeds over local devices; multi-host composition is
    unsupported and must not crash opaquely downstream)."""
    import pytest

    import nlbac_tpu.parallel as par
    from nlbac_tpu.train.cli import main

    def boom(*a, **k):
        raise AssertionError("init_distributed called before validation")

    monkeypatch.setattr(par, "init_distributed", boom)
    with pytest.raises(SystemExit, match="training flags"):
        main(["--preset", "unicycle", "--mode", "eval",
              "--num_processes", "2", "--coordinator", "h:1",
              "--process_id", "0", "--output", str(tmp_path)])
    with pytest.raises(SystemExit, match="one seed per process"):
        main(["--preset", "unicycle", "--n_seeds", "2",
              "--num_processes", "2", "--coordinator", "h:1",
              "--process_id", "0"])


def test_cli_mode_eval(tmp_path, capsys):
    """--mode eval: main() loads reference-layout weights from --output
    (then a run dir, not a parent) and prints per-episode rollouts —
    the test_policy.py replacement driven through the one CLI."""
    from nlbac_tpu.train.cli import main

    args = build_parser().parse_args([
        "--preset", "unicycle", "--max_episodes", "2",
        "--max_episode_steps", "12", "--batch_size", "4",
        "--start_steps", "4", "--hidden_size", "16",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        node=dataclasses.replace(cfg.node, hidden_dim=8,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 max_batch=8, update_interval=2),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    out = str(tmp_path / "run")
    train(cfg, output_dir=out, quiet=True)

    main(["--preset", "unicycle", "--mode", "eval",
          "--max_episode_steps", "12", "--hidden_size", "16",
          "--output", out])
    got = capsys.readouterr().out
    assert got.count("eval ep") == 5
    assert "mean over 5 eps" in got


def test_train_multi_seed(tmp_path):
    """--n_seeds: per-seed progress/weights land under s<seed>/, and each
    seed row reproduces a standalone single-seed train() run bit-for-bit
    (same key stream by construction)."""
    from nlbac_tpu.train.cli import train_multi_seed

    args = build_parser().parse_args([
        "--preset", "unicycle", "--max_episodes", "2",
        "--max_episode_steps", "12", "--batch_size", "4",
        "--start_steps", "4", "--hidden_size", "16", "--seed", "11",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        node=dataclasses.replace(cfg.node, hidden_dim=8,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 max_batch=8, update_interval=2),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    out = str(tmp_path / "multi")
    train_multi_seed(cfg, n_seeds=2, output_root=out, quiet=True)

    from nlbac_tpu.utils.plot import load_progress
    multi_rewards = {}
    for s in (11, 12):
        d = os.path.join(out, f"s{s}")
        for f in ("progress.txt", "config.json", "actor.pkl"):
            assert os.path.exists(os.path.join(d, f)), (s, f)
        cols = load_progress(os.path.join(d, "progress.txt"))
        assert len(cols["Episode"]) == 2
        multi_rewards[s] = np.asarray(cols["reward_train"])

    # bit-equivalence with a standalone run of seed 12
    solo = str(tmp_path / "solo")
    cfg12 = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, seed=12))
    train(cfg12, output_dir=solo, quiet=True)
    solo_cols = load_progress(os.path.join(solo, "progress.txt"))
    np.testing.assert_array_equal(multi_rewards[12],
                                  np.asarray(solo_cols["reward_train"]))


def test_train_resume_from_checkpoint(tmp_path):
    """--resume continues a run from the full-state checkpoint."""
    args = build_parser().parse_args([
        "--preset", "unicycle", "--max_episodes", "2",
        "--max_episode_steps", "10", "--batch_size", "4",
        "--start_steps", "4", "--hidden_size", "16",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        node=dataclasses.replace(cfg.node, hidden_dim=8,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 max_batch=8, update_interval=2),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    out1 = str(tmp_path / "a")
    train(cfg, output_dir=out1, quiet=True)
    ckpt = os.path.join(out1, "checkpoint.npz")
    assert os.path.exists(ckpt)

    # resume with a larger budget: runs only the remaining episodes
    cfg2 = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, max_episodes=4))
    out2 = str(tmp_path / "b")
    train(cfg2, output_dir=out2, quiet=True, resume_path=ckpt)
    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(os.path.join(out2, "progress.txt"))
    # resumed at episode 2 -> episodes 2 and 3 logged
    assert list(cols["Episode"]) == [2.0, 3.0]
    # total step counter carried over (10 steps/ep * 2 prior episodes)
    assert cols["episode_steps"][0] <= 10


def test_multiplier_cap_flags():
    """--rho_max / --lambda_max override the AL caps; presets keep the
    reference's hardcoded values (sac_cbf_clf.py:523 rho<=200;
    lambda<=400, 300 for CARS) when the flags are absent."""
    args = build_parser().parse_args(
        ["--preset", "quadrotor", "--rho_max", "50", "--lambda_max", "100"])
    cfg = config_from_args(args)
    assert cfg.constraint.rho_max == 50.0
    assert cfg.constraint.lambda_max == 100.0
    cfg = config_from_args(build_parser().parse_args(["--preset", "cars"]))
    assert cfg.constraint.rho_max == 200.0
    assert cfg.constraint.lambda_max == 300.0


def test_node_fit_episode_limit_flag():
    """--NODE_fit_episode_limit overrides the fit gate; absent flag keeps
    the preset's gate (quadrotor/pvtol ship 100, unicycle None)."""
    args = build_parser().parse_args(
        ["--preset", "quadrotor", "--NODE_fit_episode_limit", "210"])
    assert config_from_args(args).node.fit_episode_limit == 210
    assert config_from_args(build_parser().parse_args(
        ["--preset", "quadrotor"])).node.fit_episode_limit == 100
    assert config_from_args(build_parser().parse_args(
        ["--preset", "unicycle"])).node.fit_episode_limit is None


def test_rho_growth_flag():
    """--rho_growth overrides the per-bump ratchet rate; absent flag
    keeps the reference's hardcoded 1.0005 (sac_cbf_clf.py:523)."""
    args = build_parser().parse_args(
        ["--preset", "quadrotor", "--rho_growth", "1.0001"])
    assert config_from_args(args).constraint.rho_growth == 1.0001
    cfg = config_from_args(build_parser().parse_args(["--preset", "quadrotor"]))
    assert cfg.constraint.rho_growth == 1.0005


def test_lagrangian_warmup_flag():
    """--lagrangian_warmup_episodes plumbs to ConstraintConfig; absent
    flag keeps the reference semantics (0 = off)."""
    args = build_parser().parse_args(
        ["--preset", "quadrotor", "--lagrangian_warmup_episodes", "60"])
    assert config_from_args(args).constraint.lagrangian_warmup_episodes == 60
    cfg = config_from_args(
        build_parser().parse_args(["--preset", "quadrotor"]))
    assert cfg.constraint.lagrangian_warmup_episodes == 0


def test_env_name_flag_maps_to_preset():
    args = build_parser().parse_args(["--env-name", "SimulatedCars"])
    cfg = config_from_args(args)
    assert cfg.env.name == "cars"
    args = build_parser().parse_args(["--env-name", "Quadrotor"])
    assert config_from_args(args).env.name == "quadrotor"


def test_run_entrypoint_roundtrip_and_subprocess(tmp_path):
    """Payload encode/decode roundtrip + actual child-process execution
    (the reference's cloudpickle/zlib/base64 run_entrypoint capability)."""
    import subprocess
    import sys
    from nlbac_tpu.utils.run_entrypoint import (decode_experiment,
                                                encode_experiment)
    args = build_parser().parse_args([
        "--preset", "unicycle", "--max_episodes", "1",
        "--max_episode_steps", "6", "--batch_size", "4",
        "--start_steps", "2", "--hidden_size", "8",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        node=dataclasses.replace(cfg.node, hidden_dim=8,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 max_batch=8, update_interval=2),
        replay=ReplayConfig(capacity=32, node_capacity=32),
    )
    out = str(tmp_path / "child")
    payload = encode_experiment(cfg, output_dir=out, quiet=True)
    cfg2, kw = decode_experiment(payload)
    assert cfg2 == cfg and kw["output_dir"] == out

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # PYTHONPATH breaks the TPU plugin
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from nlbac_tpu.utils.run_entrypoint import main;"
         f"main([{payload!r}])"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "progress.txt"))


def test_evaluator_run_policy(tmp_path):
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.utils.evaluate import run_policy
    args = build_parser().parse_args([
        "--preset", "unicycle", "--max_episode_steps", "12",
        "--hidden_size", "8",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg, node=dataclasses.replace(cfg.node, hidden_dim=8,
                                      f_hidden_layers=1,
                                      g_hidden_layers=1))
    ts = create_train_state(cfg, __import__("jax").random.PRNGKey(0))
    results = run_policy(cfg, ts, episodes=2, seed=0)
    assert len(results) == 2
    for r in results:
        assert r["length"] <= 12
        assert np.isfinite(r["return"])
    # deterministic head -> identical episodes for the deterministic env
    assert results[0]["return"] == results[1]["return"]
    # --spawn_alpha is quadrotor-only: loud failure elsewhere
    import pytest
    with pytest.raises(ValueError, match="quadrotor-only"):
        run_policy(cfg, ts, episodes=1, spawn_alpha=0.5)


def test_evaluator_spawn_alpha_quadrotor():
    """--spawn_alpha: evaluate from the mix-curriculum arc. alpha=1 is
    bit-identical to the stock ground reset; alpha=0.5 spawns mid-arc
    over the obstacle (the in-flight competence metric of PARITY.md
    'Footnote (b) measured directly')."""
    import jax
    import jax.numpy as jnp
    from nlbac_tpu.envs import quadrotor as quad
    st0, obs0 = quad.reset(jax.random.PRNGKey(3))
    st1, obs1 = quad.spawn_at_alpha(1.0)
    np.testing.assert_array_equal(np.asarray(st0.x), np.asarray(st1.x))
    np.testing.assert_array_equal(np.asarray(obs0), np.asarray(obs1))
    st, _ = quad.spawn_at_alpha(0.5)
    x = np.asarray(st.x)
    # mid-arc: midpoint of goal->init plus the 0.45 clearance bump
    goal = np.asarray(quad.GOAL)
    init = np.array([float(quad.INIT_STATE[0]), float(quad.INIT_STATE[2])])
    mid = goal + 0.5 * (init - goal)
    np.testing.assert_allclose(x[0], mid[0], atol=1e-6)
    np.testing.assert_allclose(x[2], mid[1] + 0.45, atol=1e-6)
    assert np.all(x[[1, 3, 4, 5]] == 0)

    from nlbac_tpu.agent import create_train_state
    args = build_parser().parse_args([
        "--preset", "quadrotor", "--max_episode_steps", "8",
        "--hidden_size", "8",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg, node=dataclasses.replace(cfg.node, hidden_dim=8,
                                      mlp_hidden_layers=1))
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    from nlbac_tpu.utils.evaluate import run_policy
    res = run_policy(cfg, ts, episodes=1, spawn_alpha=0.5)
    assert len(res) == 1 and np.isfinite(res[0]["return"])


def test_evaluator_display_mode_headless(tmp_path):
    """--display (mode='human') degrades gracefully on headless hosts:
    frames are collected instead of a window."""
    import warnings
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.utils.evaluate import run_policy
    args = build_parser().parse_args([
        "--preset", "unicycle", "--max_episode_steps", "8",
        "--hidden_size", "8",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg, node=dataclasses.replace(cfg.node, hidden_dim=8,
                                      f_hidden_layers=1,
                                      g_hidden_layers=1))
    ts = create_train_state(cfg, __import__("jax").random.PRNGKey(0))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        results = run_policy(cfg, ts, episodes=1, seed=0, display=True)
    assert len(results) == 1


def test_n_seeds_rejects_single_seed_flags():
    """--n_seeds > 1 with --resume/--checkpoint/--profile_dir/--wandb
    fails loudly instead of silently dropping the flag (silently
    restarting under --resume would overwrite per-seed weights)."""
    import pytest

    from nlbac_tpu.train.cli import main

    for extra in (["--resume", "x.npz"], ["--checkpoint", "x.npz"],
                  ["--profile_dir", "/tmp/p"], ["--wandb"]):
        with pytest.raises(SystemExit):
            main(["--preset", "unicycle", "--n_seeds", "2"] + extra)


def test_register_env_and_builder_validation():
    """Runtime registration (register_env / register_builder): contract
    attributes are validated, collisions fail loudly, re-registering
    the same object is a no-op."""
    import pytest

    from nlbac_tpu.constraints import get_builder, register_builder
    from nlbac_tpu.envs import get_env, register_env

    class BadEnv:
        pass

    with pytest.raises(ValueError, match="missing required"):
        register_env("bad", BadEnv)
    with pytest.raises(ValueError, match="already registered"):
        register_env("unicycle", BadEnv.__class__)  # shadowing a builtin
    with pytest.raises(ValueError, match="missing required"):
        register_builder("bad", BadEnv)
    with pytest.raises(ValueError, match="already registered"):
        register_builder("unicycle", BadEnv)

    # a conforming object registers, resolves, and re-registers no-op
    uni = get_env("unicycle")

    class GoodEnv:
        SPEC = uni.SPEC._replace(name="toy_reg_test")
        reset = staticmethod(uni.reset)
        step = staticmethod(uni.step)
        obs_to_state = staticmethod(uni.obs_to_state)
        state_to_obs = staticmethod(uni.state_to_obs)

    class GoodBuilder:
        NUM_PRIMARY = 2
        NUM_BACKUP = 1
        terms = staticmethod(get_builder("unicycle").terms)

    import nlbac_tpu.constraints as _cmod
    import nlbac_tpu.envs as _emod

    try:
        register_env("toy_reg_test", GoodEnv)
        register_env("toy_reg_test", GoodEnv)  # same object: no-op
        assert get_env("toy_reg_test") is GoodEnv
        register_builder("toy_reg_test", GoodBuilder)
        assert get_builder("toy_reg_test") is GoodBuilder
    finally:
        # the registries are process-global — leaking the test entries
        # would also make a re-run's fresh class objects collide
        _emod._ENVS.pop("toy_reg_test", None)
        _cmod._BUILDERS.pop("toy_reg_test", None)


def test_examples_custom_env_runs():
    """examples/custom_env.py: a runtime-registered env + constraint
    builder trains end-to-end through the shared fused episode program
    (goal learned, zero late safety cost — asserted inside the
    example), run as a subprocess the way a user would."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "examples", "custom_env.py"),
         "--cpu"],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "zero late safety cost" in out.stdout


def test_examples_host_env_training_runs():
    """examples/host_env_training.py: host-loop training (numpy env +
    native rings + device updates) with the trap supervisor organically
    engaging the backup controller in a mud-band env — asserted inside
    the example; run as a subprocess the way a user would."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable,
         os.path.join(root, "examples", "host_env_training.py"), "--cpu"],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "host-loop supervision demo OK" in out.stdout


def test_examples_fit_dynamics_runs():
    """examples/fit_dynamics.py exercises the public ode + NODE surface
    end-to-end (odeint rk4 data generation, node_train_step fit to
    <1e-4 MSE) as a subprocess, the way a user would run it."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "examples", "fit_dynamics.py"),
         "--cpu"],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "fitted" in out.stdout


def test_evaluate_import_initializes_no_backend():
    """Importing the package — INCLUDING the full train.cli module tree
    and every env module — must NOT initialize a JAX backend: both
    --cpu flags (train + evaluate) and the multi-host path
    (jax.distributed.initialize must run before ANY backend init) rely
    on it.  Env-module constants are numpy precisely for this reason
    (r4: module-level jnp.array constants used to pin the backend at
    import, which broke init_distributed through the CLI)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        # force CPU before anything can init a backend: the positive
        # control below WILL initialize one, and on this image that
        # must not be the axon TPU tunnel (a queued client can hang
        # the subprocess for minutes — CLAUDE.md). The config update
        # itself does not initialize anything, so the first probe
        # still measures import behavior.
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import nlbac_tpu.utils.evaluate\n"
        "import nlbac_tpu.train.cli\n"
        "import nlbac_tpu.envs.quadrotor\n"
        "from jax._src import xla_bridge\n"
        # hard attribute access: if a jax upgrade moves the private
        # _backends cache this test must FAIL (not pass vacuously)
        "b = list(xla_bridge._backends)\n"
        "assert not b, f'backend initialized at import: {b}'\n"
        # positive control: the probe itself must detect inits —
        # an actual jnp computation flips it
        "import jax.numpy as jnp; jnp.zeros(1)\n"
        "assert list(xla_bridge._backends), 'probe cannot see inits'\n"
        "print('clean')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, cwd=root)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "clean" in out.stdout


def test_save_best_checkpoint(tmp_path):
    """--save_best: the best/ snapshot is the argmax of the trailing-
    window mean over progress.txt (strictly-greater semantics — the
    earliest maximum wins), written in the reference file layout and
    loadable; window is clamped to max_episodes so short runs still
    save."""
    args = build_parser().parse_args([
        "--preset", "unicycle", "--max_episodes", "8",
        "--max_episode_steps", "12", "--batch_size", "4",
        "--start_steps", "4", "--hidden_size", "16",
        "--save_best", "reward", "--save_best_window", "3",
    ])
    cfg = config_from_args(args)
    assert cfg.run.save_best_metric == "reward"
    assert cfg.run.save_best_window == 3
    cfg = dataclasses.replace(
        cfg,
        node=dataclasses.replace(cfg.node, hidden_dim=8,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 max_batch=8, update_interval=2),
        replay=ReplayConfig(capacity=128, node_capacity=128),
    )
    out = str(tmp_path / "run")
    train(cfg, output_dir=out, quiet=True)

    import json

    best_dir = os.path.join(out, "best")
    for f in ("actor.pkl", "critic.pkl", "lyapunov.pkl",
              "node_model.pkl", "best.json"):
        assert os.path.exists(os.path.join(best_dir, f)), f
    with open(os.path.join(best_dir, "best.json")) as fh:
        best = json.load(fh)

    from nlbac_tpu.utils.plot import load_progress
    r = load_progress(os.path.join(out, "progress.txt"))["reward_train"]
    means = {i: sum(r[i - 2:i + 1]) / 3 for i in range(2, 8)}
    expect_ep, expect_val = None, None
    for i, v in means.items():
        if expect_val is None or v > expect_val:
            expect_ep, expect_val = i, v
    assert best["episode"] == expect_ep
    assert best["window"] == 3
    # progress.txt prints rounded values; best.json stores the exact mean
    np.testing.assert_allclose(best["value"], expect_val, rtol=1e-4)

    # best/ weights load through the standard reader
    import jax

    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.train.checkpoint import load_model_weights
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    load_model_weights(best_dir, ts)

    # window > max_episodes clamps (short run still saves a best)
    args2 = build_parser().parse_args([
        "--preset", "unicycle", "--max_episodes", "2",
        "--max_episode_steps", "12", "--batch_size", "4",
        "--start_steps", "4", "--hidden_size", "16",
        "--save_best", "goal_rate",
    ])
    cfg2 = dataclasses.replace(
        config_from_args(args2),
        node=dataclasses.replace(cfg.node),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )
    out2 = str(tmp_path / "run2")
    train(cfg2, output_dir=out2, quiet=True)
    assert os.path.exists(os.path.join(out2, "best", "best.json"))

    # --save_best_after N gates early episodes out of the window (spawn
    # curricula saturate goal_rate early, see RunConfig.save_best_after):
    # with after=5 on 8 episodes and window 3, only eps 5..7 are
    # candidates and the single full window ends at ep 7
    args3 = build_parser().parse_args([
        "--preset", "unicycle", "--max_episodes", "8",
        "--max_episode_steps", "12", "--batch_size", "4",
        "--start_steps", "4", "--hidden_size", "16",
        "--save_best", "reward", "--save_best_window", "3",
        "--save_best_after", "5",
    ])
    cfg3 = dataclasses.replace(
        config_from_args(args3),
        node=dataclasses.replace(cfg.node),
        replay=ReplayConfig(capacity=128, node_capacity=128),
    )
    out3 = str(tmp_path / "run_after")
    train(cfg3, output_dir=out3, quiet=True)
    with open(os.path.join(out3, "best", "best.json")) as fh:
        best3 = json.load(fh)
    assert best3["episode"] == 7 and best3["after"] == 5
    r3 = load_progress(os.path.join(out3, "progress.txt"))["reward_train"]
    np.testing.assert_allclose(best3["value"], sum(r3[5:8]) / 3, rtol=1e-4)

    # validation: no output dir -> loud failure; bad window/after too
    import pytest
    with pytest.raises(ValueError, match="output dir"):
        train(cfg, output_dir=None, quiet=True)
    bad = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, save_best_window=0))
    with pytest.raises(ValueError, match="save_best_window"):
        train(bad, output_dir=str(tmp_path / "run3"), quiet=True)
    bad2 = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, save_best_after=8))
    with pytest.raises(ValueError, match="save_best_after"):
        train(bad2, output_dir=str(tmp_path / "run4"), quiet=True)

    # multi-seed: per-seed best/ snapshots, each the argmax of that
    # seed's own progress.txt trailing mean
    from nlbac_tpu.train.cli import train_multi_seed
    cfg_ms = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, seed=11, max_episodes=6))
    out_ms = str(tmp_path / "multi")
    train_multi_seed(cfg_ms, n_seeds=2, output_root=out_ms, quiet=True)
    for s in (11, 12):
        bdir = os.path.join(out_ms, f"s{s}", "best")
        with open(os.path.join(bdir, "best.json")) as fh:
            b = json.load(fh)
        assert b["seed"] == s and b["window"] == 3
        rs = load_progress(
            os.path.join(out_ms, f"s{s}", "progress.txt"))["reward_train"]
        exp_ep, exp_val = None, None
        for i in range(2, 6):
            v = sum(rs[i - 2:i + 1]) / 3
            if exp_val is None or v > exp_val:
                exp_ep, exp_val = i, v
        assert b["episode"] == exp_ep, (s, b, exp_ep)
        np.testing.assert_allclose(b["value"], exp_val, rtol=1e-4)
    with pytest.raises(ValueError, match="output dir"):
        train_multi_seed(cfg_ms, n_seeds=2, output_root=None, quiet=True)


def test_console_script_targets_resolve():
    """Every [project.scripts] target in pyproject.toml imports and is
    callable (nlbac-train / nlbac-plot / nlbac-eval)."""
    import importlib
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml")) as fh:
        text = fh.read()
    block = text.split("[project.scripts]")[1].split("[")[0]
    targets = re.findall(r'=\s*"([\w.]+):(\w+)"', block)
    assert len(targets) >= 3
    for mod_name, attr in targets:
        fn = getattr(importlib.import_module(mod_name), attr)
        assert callable(fn), (mod_name, attr)


def test_examples_custom_barrier_env_runs():
    """examples/custom_barrier_env.py: a runtime-registered NBC-family
    env + builder (USES_BARRIER=True) trains end-to-end — the barrier
    critic TD-trains on the env's barrier_signal channel and the
    learned barrier eliminates late safety cost (asserted inside the
    example)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable,
         os.path.join(root, "examples", "custom_barrier_env.py"), "--cpu"],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "barrier critic TD-trained" in out.stdout


def test_tensorboard_sink(tmp_path):
    """--tensorboard writes a readable event stream alongside
    progress.txt (the local offline alternative to the reference's
    wandb channel), with the same metric names; the flag is rejected
    where wandb is (eval mode, multi-seed)."""
    import dataclasses as dc

    from nlbac_tpu.config import ReplayConfig, get_config

    cfg = get_config("unicycle")
    cfg = dc.replace(
        cfg,
        env=dc.replace(cfg.env, max_episode_steps=20),
        sac=dc.replace(cfg.sac, hidden_dim=8, batch_size=8,
                       updates_per_step=1, start_steps=4),
        node=dc.replace(cfg.node, hidden_dim=8, f_hidden_layers=1,
                        g_hidden_layers=1, max_batch=8,
                        update_interval=2),
        replay=ReplayConfig(capacity=128, node_capacity=128),
        run=dc.replace(cfg.run, max_episodes=3, log_tensorboard=True),
    )
    out = str(tmp_path / "run")
    train(cfg, output_dir=out, quiet=True)
    tb_dir = os.path.join(out, "tb")
    assert os.path.isdir(tb_dir) and os.listdir(tb_dir)
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    acc = EventAccumulator(tb_dir)
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert "Episode Reward" in tags, tags
    rewards = [e.value for e in acc.Scalars("Episode Reward")]
    assert len(rewards) == 3 and all(np.isfinite(rewards))

    # flag conflicts are loud, mirroring --wandb
    import pytest

    from nlbac_tpu.train.cli import main as cli_main
    with pytest.raises(SystemExit, match="tensorboard"):
        cli_main(["--mode", "eval", "--tensorboard", "--output", out])
    with pytest.raises(SystemExit, match="tensorboard"):
        cli_main(["--n_seeds", "2", "--tensorboard", "--output", out])


def test_evaluate_cli_json(tmp_path):
    """nlbac-eval --json writes machine-readable per-episode results +
    means that match the printed channel (the CI-gate output)."""
    import jax
    import json

    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import get_config
    from nlbac_tpu.train.checkpoint import save_model_weights
    from nlbac_tpu.utils.evaluate import main as eval_main

    cfg = get_config("unicycle")
    ts = create_train_state(cfg, jax.random.PRNGKey(5))
    run_dir = str(tmp_path / "run")
    save_model_weights(run_dir, ts)
    out_json = str(tmp_path / "eval.json")
    eval_main([run_dir, "--preset", "unicycle", "--episodes", "2",
               "--json", out_json])
    with open(out_json) as fh:
        d = json.load(fh)
    assert d["preset"] == "unicycle" and len(d["episodes"]) == 2
    assert d["deterministic"] is True
    rets = [e["return"] for e in d["episodes"]]
    assert np.isfinite(rets).all()
    np.testing.assert_allclose(d["mean"]["return"], np.mean(rets),
                               rtol=1e-6)


def test_cli_host_loop_mode(tmp_path):
    """--host_loop is a user-invocable training mode: the preset env
    behind the host gym API + native C++ rings (train/host_loop.py),
    producing the SAME run-dir artifacts as the fused mode — config
    .json, progress.txt with the loss columns, reference-layout weights
    that --mode eval then loads."""
    import pytest

    from nlbac_tpu import runtime_native as rn
    from nlbac_tpu.train.cli import main

    if not rn.native_available():
        pytest.skip("native host data plane unavailable")
    out = str(tmp_path / "hl")
    main(["--preset", "unicycle", "--host_loop", "--max_episodes", "2",
          "--max_episode_steps", "20", "--start_steps", "10",
          "--batch_size", "16", "--replay_size", "4096",
          "--output", out, "--quiet"])
    run = os.path.join(out, "unicycle-run1", "Node_LBAC_Unicycle",
                       "Node_LBAC_Unicycle_s12345")
    for f in ("progress.txt", "config.json", "actor.pkl", "critic.pkl",
              "lyapunov.pkl", "node_model.pkl"):
        assert os.path.exists(os.path.join(run, f)), f
    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(os.path.join(run, "progress.txt"))
    assert len(cols["Episode"]) == 2
    assert np.all(np.isfinite(cols["reward_train"]))
    # warm-up episode emits the loss columns too (header freezing) —
    # the FULL fused-driver column set incl. the Lagrangian diagnostics
    # (rho/lam_max diagnose multiplier collapse from progress.txt alone)
    for col in ("qf1_loss", "policy_loss", "alpha_loss", "alpha",
                "rho", "lam_max", "reached"):
        assert col in cols, col
    # the saved weights round-trip through the eval entry point
    main(["--preset", "unicycle", "--mode", "eval", "--output", run,
          "--max_episode_steps", "20"])


def test_cli_host_loop_rejects_fused_mode_flags():
    """--host_loop fails loudly when combined with fused-device-mode
    features (dp/tp/n_seeds/resume/checkpoint/sinks, eval mode, spawn
    curriculum) instead of silently ignoring them."""
    import pytest

    from nlbac_tpu.train.cli import main

    # NOTE r5: --wandb/--tensorboard/--checkpoint/--resume are now
    # SUPPORTED under --host_loop (the reference's own host loop has
    # mid-run saves + per-episode wandb, UNI/main.py:153-165); only
    # genuinely-inapplicable flags stay rejected.
    for extra in (["--dp", "2"], ["--tp", "2"], ["--n_seeds", "2"],
                  ["--profile_dir", "/tmp/p"], ["--mode", "eval"],
                  ["--save_best", "reward"],
                  # dependent flags are rejected too, not silently inert
                  # (value-taking flags: explicit falsy values must
                  # still fail loudly — advisor r4)
                  ["--save_best_window", "0"],
                  ["--save_best_after", "10"]):
        with pytest.raises(SystemExit):
            main(["--preset", "unicycle", "--host_loop"] + extra)
    with pytest.raises(SystemExit, match="curriculum"):
        main(["--preset", "quadrotor", "--host_loop",
              "--spawn_curriculum_episodes", "5"])


def test_cli_host_loop_fails_before_run_dir_without_native(tmp_path,
                                                           monkeypatch):
    """If the native host data plane cannot be built, --host_loop must
    fail as a clean SystemExit BEFORE any run dir / config.json is
    created (the loud-SystemExit-before-output-dirs rule)."""
    import pytest

    from nlbac_tpu import runtime_native as rn
    from nlbac_tpu.train.cli import main

    monkeypatch.setattr(rn, "native_available", lambda: False)
    out = str(tmp_path / "never")
    with pytest.raises(SystemExit, match="native"):
        main(["--preset", "unicycle", "--host_loop", "--max_episodes",
              "1", "--output", out, "--quiet"])
    assert not os.path.exists(out)


def test_cli_host_loop_nbc_barrier_column(tmp_path):
    """NBC presets under --host_loop emit the barrier_td_loss progress
    column (same convention as the fused driver) with a nonzero value
    once updates run, and save barrier.pkl."""
    import glob

    import pytest

    from nlbac_tpu import runtime_native as rn
    from nlbac_tpu.train.cli import main

    if not rn.native_available():
        pytest.skip("native host data plane unavailable")
    out = str(tmp_path / "hl_nbc")
    main(["--preset", "nbc_unicycle", "--host_loop", "--max_episodes",
          "2", "--max_episode_steps", "25", "--start_steps", "10",
          "--batch_size", "16", "--replay_size", "4096",
          "--output", out, "--quiet"])
    p = glob.glob(os.path.join(out, "**", "progress.txt"),
                  recursive=True)[0]
    from nlbac_tpu.utils.plot import load_progress
    cols = load_progress(p)
    assert "barrier_td_loss" in cols
    assert np.isfinite(cols["barrier_td_loss"]).all()
    assert abs(cols["barrier_td_loss"][-1]) > 0
    assert os.path.exists(os.path.join(os.path.dirname(p), "barrier.pkl"))
