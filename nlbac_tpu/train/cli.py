"""Training CLI: one entry point with five presets, replacing the
reference's five main.py copies (UNI/main.py:189-286 etc.).

All of the reference's ~25 argparse flags are exposed (plus the constants
it hardwires), mapped onto the typed config tree.  The episode loop stays
host-side (logging/checkpointing); each episode runs as one jitted XLA
program via :mod:`nlbac_tpu.train.driver`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.config import NLBACConfig, get_config
from nlbac_tpu.constraints import uses_barrier
from nlbac_tpu.train.checkpoint import (AsyncCheckpointer, _to_host,
                                        save_model_weights)
from nlbac_tpu.train.driver import create_replays, make_episode_runner
from nlbac_tpu.train.logging import (EpochLogger, MetricsSink, StepTimer,
                                     colorize)
from nlbac_tpu.utils.output import get_output_folder, setup_logger_kwargs


def _str2bool(s: str) -> bool:
    v = s.strip().lower()
    if v in ("1", "true", "yes", "y", "on"):
        return True
    if v in ("0", "false", "no", "n", "off"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {s!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="NLBAC-TPU training")
    p.add_argument("--preset", default="unicycle",
                   choices=["unicycle", "cars", "pvtol", "nbc_unicycle",
                            "nbc_pvtol", "quadrotor"],
                   help="experiment preset (replaces the program copies)")
    p.add_argument("--env-name", default=None,
                   choices=["Unicycle", "SimulatedCars", "Pvtol",
                            "Quadrotor"],
                   help="reference-style env name (maps onto a preset; "
                        "--preset is the native way)")
    p.add_argument("--seed", type=int, default=12345)
    p.add_argument("--n_seeds", type=int, default=1,
                   help="train N independent seeds (seed..seed+N-1) "
                        "concurrently, one per device round-robin — the "
                        "seed-parallel successor to the reference's dead "
                        "mpi_fork (async dispatch; see parallel/mesh.py). "
                        "Per-seed output lands in <output>/s<seed>/")
    p.add_argument("--output", default="output")
    p.add_argument("--mode", default="train", choices=["train", "eval"])
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel width: shard the update batches "
                        "of the fused episode program over a ('dp',) "
                        "device mesh (GSPMD inserts the gradient psums "
                        "over ICI; numerics reproduce the single-device "
                        "run to f32 tolerance — certified in "
                        "dryrun_multichip). Composes with --n_seeds: "
                        "each seed trains dp-sharded on its own disjoint "
                        "group of dp devices. Requires batch_size and "
                        "the NODE max_batch divisible by the width")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel width: Megatron-shard every "
                        "network's params (and their targets and Adam "
                        "moments) over a 'tp' mesh axis inside the fused "
                        "episode program (GSPMD inserts the all-reduces; "
                        "numerics == single-device to f32 tolerance — "
                        "certified in dryrun_multichip). Composes with "
                        "--dp on a ('dp','tp') mesh and with --n_seeds "
                        "(each seed on its own dp x tp device group). A "
                        "throughput LOSS at "
                        "the reference's widths (hidden <= 256) — the "
                        "mode exists so grown models shard without code "
                        "changes")
    p.add_argument("--host_loop", action="store_true",
                   help="train with the host-loop architecture instead "
                        "of the fused device program: host-side data "
                        "plane (native C++ replay rings), a Python step "
                        "loop, device-side updates — the reference's "
                        "own program shape (UNI/main.py:56-104). The "
                        "preset env runs through the host gym API "
                        "(envs.as_host_env); same semantics, one device "
                        "dispatch per env step, so on a tunneled TPU "
                        "the fused mode is the fast path. Single-seed, "
                        "single-device; no spawn curriculum")
    # multi-host launch (jax.distributed): one process per host, same
    # command everywhere apart from --process_id. The successor to the
    # reference's vendored-but-dead mpi_fork (UNI/utils/mpi_tools.py).
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address host:port "
                        "(jax.distributed.initialize); required with "
                        "--num_processes > 1")
    p.add_argument("--num_processes", type=int, default=1,
                   help="number of cooperating host processes (multi-"
                        "host --dp; 1 = single-process, the default)")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's rank in [0, num_processes); "
                        "required with --num_processes > 1. Only rank 0 "
                        "writes logs/checkpoints")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend before any backend init "
                        "(same flag as the evaluator) — localhost "
                        "multi-process gangs and dev runs; combine with "
                        "XLA_FLAGS=--xla_force_host_platform_device_"
                        "count=N for N virtual devices per process")
    p.add_argument("--policy", default=None,
                   choices=["Gaussian", "Deterministic"],
                   help="Policy type (reference --policy flag)")
    # SAC
    p.add_argument("--gamma", type=float, default=None)
    p.add_argument("--tau", type=float, default=None)
    p.add_argument("--lr", type=float, default=None, help="policy lr")
    p.add_argument("--alpha", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--hidden_size", type=int, default=None)
    p.add_argument("--updates_per_step", type=int, default=None)
    p.add_argument("--start_steps", type=int, default=None)
    p.add_argument("--target_update_interval", type=int, default=None)
    p.add_argument("--automatic_entropy_tuning", type=_str2bool,
                   default=None,
                   help="true/false/1/0/yes/no (the reference's type=bool "
                        "flag treats any non-empty string as True; we parse "
                        "properly)")
    # episodes / env
    p.add_argument("--max_episodes", type=int, default=None)
    p.add_argument("--max_episode_steps", type=int, default=None)
    p.add_argument("--spawn_curriculum_episodes", type=int, default=None,
                   help="opt-in reverse spawn curriculum (quadrotor): "
                        "anneal the spawn from near-goal back to the "
                        "standard start over this many episodes (0=off)")
    p.add_argument("--spawn_curriculum_mode", default=None,
                   choices=["anneal", "mix", "mix_early"],
                   help="what happens after the spawn anneal completes "
                        "(quadrotor, requires --spawn_curriculum_episodes"
                        ">0): 'anneal' pins spawns to the ground start; "
                        "'mix' (lever 12) keeps a stationary mixed-height "
                        "distribution — every 3rd episode an exact ground "
                        "start, the rest alpha~Uniform(0.15,1); 'mix_early' additionally runs the ground cadence from episode 0 (lever 17)")
    p.add_argument("--spawn_mix_alpha_min", type=float, default=None,
                   help="mix-mode mixture lower bound in [0.15, 1) "
                        "(lever 13): raise toward 1 to concentrate "
                        "post-anneal rehearsal on the hard near-ground "
                        "band (requires --spawn_curriculum_mode mix)")
    p.add_argument("--kill_penalty", type=float, default=None,
                   help="terminal crash penalty (quadrotor only): "
                        "subtract this from the reward on a kill-box "
                        "termination. The quadrotor preset ships 250 "
                        "(measured best, PARITY.md); pass 0 to disable")
    p.add_argument("--kill_attitude", type=float, default=None,
                   help="attitude-kill termination in radians (quadrotor "
                        "only): terminate (and apply kill_penalty) when "
                        "|theta| exceeds this, like the real "
                        "safe-control-gym. 0 = off (every preset default)")
    p.add_argument("--pretanh_reg", type=float, default=None,
                   help="pre-tanh mean regularizer coefficient on the "
                        "policy loss (the original SAC codebase's policy "
                        "regularization; Gaussian policy only). Targets "
                        "tanh-saturation traps (PARITY.md r7 quadrotor "
                        "ground start). 0 = off (every preset default)")
    p.add_argument("--probe_pretanh_reg", type=float, default=None,
                   help="probe-targeted pre-tanh mean regularizer: the "
                        "mu^2 pull is evaluated on the env's fixed "
                        "ground_probe_obs() batch (quadrotor only) so it "
                        "reaches the ground-start saturation trap "
                        "regardless of replay composition (PARITY.md r7 "
                        "lever 18). 0 = off (every preset default)")
    p.add_argument("--target_entropy", type=float, default=None,
                   help="override the SAC target entropy for both "
                        "temperature updates. Reference presets default "
                        "to -dim(A); the quadrotor preset ships -6.0 "
                        "(measured best with rho_max=50, PARITY.md r5) "
                        "— pass -2 there to "
                        "restore -dim(A). See SacConfig.target_entropy "
                        "for the action-scale calibration note")
    # constraints
    p.add_argument("--gamma_b", type=float, default=None)
    p.add_argument("--gamma_l", type=float, default=None)
    p.add_argument("--rho_max", type=float, default=None,
                   help="cap on the augmented-Lagrangian penalty "
                        "coefficient rho (reference hardcodes 200, "
                        "sac_cbf_clf.py:523). The rho*c^2 term growing "
                        "to this cap is the measured quadrotor "
                        "goal-retention killer (PARITY.md r5)")
    p.add_argument("--lambda_max", type=float, default=None,
                   help="cap on the Lagrange multipliers (reference "
                        "hardcodes 400; 300 for CARS)")
    p.add_argument("--rho_growth", type=float, default=None,
                   help="per-bump multiplicative growth of the "
                        "augmented-Lagrangian coefficient rho (reference "
                        "hardcodes 1.0005, sac_cbf_clf.py:523; bumped on "
                        "every loss evaluation). Lowering it slows the "
                        "ratchet whose climb past rho~30 is the measured "
                        "quadrotor goal-retention killer (PARITY.md r6)")
    p.add_argument("--lagrangian_warmup_episodes", type=int, default=None,
                   help="opt-in (lever 10, quadrotor take-off): freeze "
                        "multiplier ascent and rho growth for the first "
                        "N episodes so constraint pressure cannot "
                        "outpace early policy learning (0=off)")
    p.add_argument("--l_p", type=float, default=None)
    p.add_argument("--Lagrangian_multiplier_update_interval", type=int,
                   default=None)
    p.add_argument("--backup_update_interval", type=int, default=None)
    # NODE
    p.add_argument("--NODE_model_update_interval", type=int, default=None)
    p.add_argument("--NODE_fit_episode_limit", type=int, default=None,
                   help="fit the NODE dynamics model only while "
                        "episode <= N (PVTOL reference recipe: 100; the "
                        "quadrotor preset also ships 100 — see PARITY.md "
                        "'Quadrotor: NODE-fit gate'). Pass a value "
                        ">= max_episodes to keep fitting for the whole "
                        "run; presets keep their gate when absent")
    p.add_argument("--node_solver", default=None,
                   choices=["euler", "midpoint", "heun", "rk4", "dopri5"])
    p.add_argument("--node_adaptive_impl", default=None,
                   choices=["while", "scan"],
                   help="dopri5 loop implementation: 'while' (adaptive "
                        "lax.while_loop + adjoint VJP; crashes the axon "
                        "backend inside the fused episode program) or "
                        "'scan' (fixed-trip masked acceptance; nests "
                        "everywhere, directly differentiable)")
    p.add_argument("--node_adaptive_scan_steps", type=int, default=None,
                   help="scan-impl trial-step bound (default 16). A "
                        "compiled loop cannot raise: if the controller "
                        "rejects enough steps to exhaust the bound, the "
                        "integration is silently PARTIAL — raise this "
                        "if the NODE field is stiff (every trip is paid "
                        "in compute; the while impl's backstop is 512)")
    p.add_argument("--reference_time_labels", action="store_true",
                   help="push the reference's off-by-one-dt NODE-buffer "
                        "transition times (t=step*dt) instead of the "
                        "physically-consistent default ((step-1)*dt, "
                        "shared with the RL buffer). Only the Cars "
                        "time-input NODE feature sees the difference; "
                        "set this for bit-faithful Cars reproduction "
                        "(PARITY.md 'Deviations from the reference')")
    p.add_argument("--replay_size", type=int, default=None)
    # logging
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--wandb_project", default=None)
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard event files to "
                        "<output>/tb (local offline alternative to "
                        "--wandb; same metric names)")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--checkpoint", default=None,
                   help="full-state checkpoint path to write")
    p.add_argument("--resume", default=None,
                   help="full-state checkpoint to resume from (true "
                        "resume: params/opt/lambda/rho/replay/PRNG). "
                        "Native format is npz (arrays only, safe to "
                        "load); legacy round-1 pickle checkpoints also "
                        "load but execute code — trusted paths only")
    p.add_argument("--profile_dir", default=None,
                   help="jax.profiler trace dir (first episode)")
    p.add_argument("--save_best", default=None,
                   choices=["reward", "goal_rate"],
                   help="track the trailing --save_best_window mean of "
                        "this per-episode metric and snapshot the best "
                        "weights to <output>/best/ (the reference only "
                        "saves on a fixed cadence, so late Lagrangian "
                        "drift ships post-drift weights); load with "
                        "--mode eval pointed at the best/ dir")
    p.add_argument("--save_best_window", type=int, default=None,
                   help="trailing window (episodes) for --save_best "
                        "(default 30)")
    p.add_argument("--save_best_after", type=int, default=None,
                   help="ignore episodes < N for --save_best (under a "
                        "spawn curriculum the early trivial spawns "
                        "saturate goal_rate at 1.0 and no later window "
                        "can strictly beat it; set N to the curriculum "
                        "end)")
    return p


_ENV_NAME_TO_PRESET = {"Unicycle": "unicycle", "SimulatedCars": "cars",
                       "Pvtol": "pvtol", "Quadrotor": "quadrotor"}


def config_from_args(args) -> NLBACConfig:
    preset = args.preset
    if getattr(args, "env_name", None):
        preset = _ENV_NAME_TO_PRESET[args.env_name]
    cfg = get_config(preset)

    def rep(obj, **kw):
        kw = {k: v for k, v in kw.items() if v is not None}
        return dataclasses.replace(obj, **kw) if kw else obj

    cfg = dataclasses.replace(
        cfg,
        sac=rep(cfg.sac,
                policy_type=(args.policy.lower() if args.policy else None),
                gamma=args.gamma, tau=args.tau,
                policy_lr=args.lr, alpha_init=args.alpha,
                batch_size=args.batch_size, hidden_dim=args.hidden_size,
                updates_per_step=args.updates_per_step,
                start_steps=args.start_steps,
                target_update_interval=args.target_update_interval,
                automatic_entropy_tuning=args.automatic_entropy_tuning,
                target_entropy=args.target_entropy,
                pretanh_reg=args.pretanh_reg,
                probe_pretanh_reg=args.probe_pretanh_reg),
        env=rep(cfg.env, max_episode_steps=args.max_episode_steps,
                spawn_curriculum_episodes=args.spawn_curriculum_episodes,
                spawn_curriculum_mode=args.spawn_curriculum_mode,
                spawn_mix_alpha_min=args.spawn_mix_alpha_min,
                kill_penalty=args.kill_penalty,
                kill_attitude=args.kill_attitude),
        constraint=rep(cfg.constraint, gamma_b=args.gamma_b,
                       gamma_l=args.gamma_l, lookahead=args.l_p,
                       rho_max=args.rho_max, lambda_max=args.lambda_max,
                       rho_growth=args.rho_growth,
                       lagrangian_warmup_episodes=(
                           args.lagrangian_warmup_episodes),
                       lambda_update_interval=(
                           args.Lagrangian_multiplier_update_interval),
                       backup_update_interval=args.backup_update_interval),
        node=rep(cfg.node,
                 update_interval=args.NODE_model_update_interval,
                 fit_episode_limit=args.NODE_fit_episode_limit,
                 solver=args.node_solver,
                 adaptive_impl=args.node_adaptive_impl,
                 adaptive_scan_steps=args.node_adaptive_scan_steps,
                 reference_time_labels=(True if args.reference_time_labels
                                        else None)),
        run=rep(cfg.run, seed=args.seed,
                max_episodes=args.max_episodes, output=args.output,
                log_wandb=True if args.wandb else None,
                log_tensorboard=True if args.tensorboard else None,
                wandb_project=args.wandb_project,
                save_best_metric=args.save_best,
                save_best_window=args.save_best_window,
                save_best_after=args.save_best_after),
    )
    if args.replay_size is not None:
        cap = min(args.replay_size,
                  cfg.run.max_episodes * cfg.env.max_episode_steps + 1)
        cfg = dataclasses.replace(
            cfg, replay=dataclasses.replace(cfg.replay, capacity=cap,
                                            node_capacity=cap))
    return cfg


def enable_compilation_cache(path: str = "/tmp/jax_cache_nlbac") -> None:
    """Persistent XLA compilation cache: the fused episode program takes
    minutes to compile on the remote TPU compiler; cache it across runs."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax without the knob


def train(cfg: NLBACConfig, output_dir: str | None = None,
          quiet: bool = False, checkpoint_path: str | None = None,
          profile_dir: str | None = None, resume_path: str | None = None,
          dp: int = 1, tp: int = 1):
    """The training loop (UNI/main.py train() equivalent).

    ``dp > 1`` runs the SAME loop with the episode program's update
    batches sharded over a ('dp',) mesh of ``dp`` devices (state
    replicated; GSPMD inserts the gradient psums) — numerics reproduce
    the dp=1 run to f32 tolerance (certified in dryrun_multichip and
    tests/test_parallel.py).  ``tp > 1`` Megatron-shards every network's
    params/targets/Adam moments over a 'tp' axis instead (or additionally
    — ('dp','tp') mesh), same numerics certificate."""
    logger_dir = output_dir
    logger = EpochLogger(logger_dir, quiet=quiet)
    logger.save_config(cfg)
    # external sinks are rank-0-only (output_dir is None on other ranks):
    # every rank opening wandb.init would create num_processes duplicate
    # runs for one job, and the tensorboard dir needs the run dir anyway
    from nlbac_tpu.parallel import is_rank0
    emit = is_rank0() and output_dir is not None
    sink = MetricsSink(logger, use_wandb=cfg.run.log_wandb and emit,
                       wandb_project=cfg.run.wandb_project,
                       wandb_config=cfg.to_dict(),
                       tensorboard_dir=(os.path.join(output_dir, "tb")
                                        if cfg.run.log_tensorboard and emit
                                        else None))
    timer = StepTimer()

    key = jax.random.PRNGKey(cfg.run.seed)
    key, kinit = jax.random.split(key)
    start_episode = 0
    with timer.time("init"):
        ts = create_train_state(cfg, kinit)
        rl_replay, node_replay = create_replays(cfg)
        if resume_path is not None:
            from nlbac_tpu.train.checkpoint import restore_checkpoint
            (ts, rl_replay, node_replay, key, total0, ep0, _extra) = \
                restore_checkpoint(resume_path, ts, rl_replay,
                                   node_replay, key)
            start_episode = int(ep0) + 1
            print(colorize(f"resumed from {resume_path} at episode "
                           f"{start_episode} ({int(total0)} steps)",
                           "yellow"))
        # NOTE: donating (ts, replays) would let XLA update the ~100MB of
        # buffers in place, but buffer donation trips the axon TPU runtime
        # (InvalidArgument at execution); the copies cost ~0.1ms/episode,
        # so run un-donated.
        if tp > 1:
            # tp (or dp x tp) mode: params sharded over 'tp', batches
            # over 'dp' (when dp > 1). Plain jit, same AOT-cache caveat
            # as dp below.
            from nlbac_tpu.parallel import make_tp_episode_runner
            place, run_episode = make_tp_episode_runner(cfg, tp, dp=dp)
            ts, rl_replay, node_replay = place((ts, rl_replay,
                                                node_replay))
        elif dp > 1:
            # dp mode: plain jit (a jax.export'd module pins the device
            # assignment, so the AOT lowering cache stays dp=1-only; the
            # persistent XLA compilation cache still covers the
            # executable). place() replicates the training state over
            # the mesh; the sharding constraints inside the program do
            # the actual batch partitioning.
            from nlbac_tpu.parallel import make_dp_episode_runner
            place, run_episode = make_dp_episode_runner(cfg, dp)
            ts, rl_replay, node_replay = place((ts, rl_replay,
                                                node_replay))
        else:
            # AOT cache: reuse the serialized lowered module across
            # process restarts (lowering through the axon remote backend
            # takes 5-300s; deserializing takes ~0.03s — see train/aot.py)
            from nlbac_tpu.train.aot import cached_episode_runner
            run_episode = cached_episode_runner(
                cfg, (ts, rl_replay, node_replay, key, jnp.int32(0),
                      jnp.int32(0)))

    total_steps = (jnp.int32(total0) if resume_path is not None
                   else jnp.int32(0))
    save_every = max(1, cfg.run.max_episodes // cfg.run.save_every_fraction)
    is_nbc = uses_barrier(cfg.constraint.kind)
    ckpt_writer = AsyncCheckpointer()

    # Best-checkpoint selection (RunConfig.save_best_metric): trailing-
    # window mean, evaluated only once the window fills so an early lucky
    # episode cannot set the bar. Build-time validation: fail loudly
    # before the first episode, not at the first would-be save.
    best_metric = cfg.run.save_best_metric
    if best_metric is not None:
        if best_metric not in ("reward", "goal_rate"):
            raise ValueError(f"save_best_metric={best_metric!r} must be "
                             "'reward' or 'goal_rate'")
        if cfg.run.save_best_window < 1:
            raise ValueError("save_best_window must be >= 1")
        if output_dir is None:
            raise ValueError("save_best_metric requires an output dir "
                             "(weights go to <output>/best/)")
        if cfg.run.save_best_after >= cfg.run.max_episodes:
            raise ValueError(
                f"save_best_after={cfg.run.save_best_after} must be < "
                f"max_episodes={cfg.run.max_episodes} (no episode would "
                "ever be tracked)")
        from collections import deque
        # clamp to the episodes this process will actually track (short
        # runs, late --resume points, and a save_best_after gate still
        # produce a best/ snapshot)
        best_first = max(start_episode, cfg.run.save_best_after)
        best_window = deque(maxlen=max(1, min(
            cfg.run.save_best_window,
            cfg.run.max_episodes - best_first)))
        best_mean = None
        best_dir = os.path.join(output_dir, "best")

    for i_episode in range(start_episode, cfg.run.max_episodes):
        key, kep = jax.random.split(key)
        phase = "episode_first" if i_episode == 0 else "episode"
        # profile the second episode THIS PROCESS runs (episode 1 on a
        # fresh start): under --resume the old `i_episode == 1` test
        # never fired and the user waited out the run for an empty
        # trace dir. start_episode+1 skips the compile episode either
        # way, so the trace captures a steady-state episode.
        profile_this = profile_dir and i_episode == start_episode + 1
        with timer.time(phase):
            if profile_this:
                jax.profiler.start_trace(profile_dir)
            ts, rl_replay, node_replay, m, total_steps = run_episode(
                ts, rl_replay, node_replay, kep, jnp.int32(i_episode),
                total_steps)
            m.reward.block_until_ready()
            if profile_this:
                jax.profiler.stop_trace()
        # ONE pipelined D2H fetch of the episode metrics: the float()/
        # int() reads below would otherwise each pay a tunnel round trip
        # (~60ms x ~15 scalars x episode count added ~190s to a 200-
        # episode run — measured; same pathology as checkpoint._to_host)
        # (ts.updates and total_steps ride the same fetch — a separate
        # sequential read each paid its own round trip per episode)
        m, total_steps_host, updates_host = _to_host(
            (m, total_steps, ts.updates))
        total_steps_host = int(total_steps_host)

        # best-checkpoint selection: strictly-greater trailing mean wins
        # (first full window always saves), weights in the reference file
        # layout so --mode eval / load_model_weights read best/ directly
        if best_metric is not None and i_episode >= cfg.run.save_best_after:
            best_window.append(float(m.reward) if best_metric == "reward"
                               else float(m.goal_met))
            if len(best_window) == best_window.maxlen:
                cur = sum(best_window) / len(best_window)
                if best_mean is None or cur > best_mean:
                    best_mean = cur
                    save_model_weights(best_dir, ts,
                                       include_barrier=is_nbc)
                    with open(os.path.join(best_dir, "best.json"),
                              "w") as f:
                        json.dump({"episode": i_episode,
                                   "metric": best_metric,
                                   "window": len(best_window),
                                   "after": cfg.run.save_best_after,
                                   "value": cur}, f)

        # checkpoints (UNI/main.py:153-154 cadence + full state)
        if (i_episode % save_every == 0
                or i_episode == cfg.run.max_episodes - 1):
            if output_dir is not None:
                save_model_weights(output_dir, ts,
                                   include_barrier=is_nbc)
                if checkpoint_path is None:
                    checkpoint_path = os.path.join(output_dir,
                                                   "checkpoint.npz")
                # async: the npz write overlaps the next episodes
                ckpt_writer.save(checkpoint_path, ts, rl_replay,
                                 node_replay, key, total_steps, i_episode)

        # wandb-channel metrics (UNI/main.py:157-165; PVTOL breakdowns)
        wb = {
            "Episode Reward": float(m.reward),
            "Episode Length": int(m.steps),
            "Episode Safety Cost": float(m.safety_cost),
            "Episode Number of Safety Violations": float(m.num_violations),
            "Cumulated Number of steps": total_steps_host,
        }
        if cfg.env.name == "cars":
            wb["Episode Number of reaching destination"] = float(m.reached)
        if cfg.env.name == "pvtol":
            vb, cb = m.viol_breakdown, m.cost_breakdown
            wb.update({
                "Episode Number of Collisions with Obstacles": float(vb[0]),
                "Episode Number of Violations concerning Safety Operator":
                    float(vb[1]),
                "Episode Number of Violations concerning ymin": float(vb[2]),
                "Episode Number of Violations concerning ymax": float(vb[3]),
                "Episode Safety Cost Concerning Obstacles": float(cb[0]),
                "Episode Safety Cost Concerning Safety Operator":
                    float(cb[1]),
                "Episode Safety Cost Concerning ymin": float(cb[2]),
                "Episode Safety Cost Concerning ymax": float(cb[3]),
            })
        sink.log(wb)

        # EpochLogger channel (UNI/main.py:168-186)
        logger.store(Episode=i_episode, episode_steps=int(m.steps),
                     reward_train=float(m.reward),
                     cost_train=float(m.num_violations),
                     safety_cost_train=float(m.safety_cost),
                     goal_met=float(m.goal_met),
                     reached=float(m.reached))
        train_cols = ["qf1_loss", "qf2_loss", "lf_loss", "policy_loss",
                      "alpha_loss", "alpha", "node_loss", "rho", "lam_max"]
        if is_nbc:
            # barrier-critic TD loss: NBC-family runs only, appended past
            # the shared column set (header-keyed parsers stay compatible)
            train_cols.append("barrier_td_loss")
        for k in train_cols:
            logger.store(**{k: float(m.train[k])})
        logger.log_tabular("Episode")
        logger.log_tabular("episode_steps")
        logger.log_tabular("reward_train")
        logger.log_tabular("cost_train")
        logger.log_tabular("safety_cost_train")
        logger.log_tabular("goal_met")
        logger.log_tabular("reached")
        # rho/lam_max: augmented-Lagrangian state, appended past the
        # reference's column set so archived-run parsers (header-keyed)
        # stay compatible — added r5 to make multiplier-driven collapse
        # (PARITY.md "Quadrotor") diagnosable from progress.txt alone.
        for k in train_cols:
            logger.log_tabular(k)
        logger.log_tabular("updates", int(updates_host))
        logger.log_tabular("backup_steps", int(m.backup_steps))
        logger.dump_tabular()

    ckpt_writer.wait()  # last npz write must land before we return
    sink.close()
    for phase, total in timer.summary().items():
        print(colorize(f"{phase}: {total}", "cyan"))
    return ts, rl_replay, node_replay


def train_multi_seed(cfg: NLBACConfig, n_seeds: int,
                     output_root: str | None, quiet: bool = False,
                     dp: int = 1, tp: int = 1):
    """Seed-parallel training (``--n_seeds``): N independent seeds advance
    concurrently by async dispatch of the plain episode program, laid out
    one-per-device round-robin (parallel/mesh.py, the measured fast path)
    — the usable successor to the reference's vendored-but-dead
    ``mpi_fork`` (UNI/utils/mpi_tools.py:6-36).

    Seed i trains with ``cfg.run.seed + i`` under exactly the key stream
    of a single-seed :func:`train` run, and writes its own
    ``progress.txt`` + reference-layout weight files under
    ``<output_root>/s<seed>/`` (the per-seed output convention of the
    reference's setup_logger_kwargs, UNI/utils/run_utils.py:25-86).  A
    per-episode aggregate row (mean/std/min/max reward across seeds,
    host-side numpy with the mpi_statistics_scalar ddof=0 convention)
    prints to stdout.  ``--save_best`` tracks each seed independently
    (best weights under ``s<seed>/best/``).  Full-state checkpoint/
    resume and wandb remain single-seed (:func:`train`) features —
    ``main()`` rejects the combination loudly."""
    from nlbac_tpu.parallel import make_async_seed_runner

    if cfg.run.save_best_metric is not None:
        if cfg.run.save_best_metric not in ("reward", "goal_rate"):
            raise ValueError(
                f"save_best_metric={cfg.run.save_best_metric!r} must be "
                "'reward' or 'goal_rate'")
        if cfg.run.save_best_window < 1:
            raise ValueError("save_best_window must be >= 1")
        if output_root is None:
            raise ValueError("save_best_metric requires an output dir "
                             "(weights go to s<seed>/best/)")
        if cfg.run.save_best_after >= cfg.run.max_episodes:
            raise ValueError(
                f"save_best_after={cfg.run.save_best_after} must be < "
                f"max_episodes={cfg.run.max_episodes}")

    seeds = [cfg.run.seed + i for i in range(n_seeds)]
    loggers = []
    for s in seeds:
        d = (os.path.join(output_root, f"s{s}")
             if output_root is not None else None)
        loggers.append(EpochLogger(d, quiet=True))
        loggers[-1].save_config(dataclasses.replace(
            cfg, run=dataclasses.replace(cfg.run, seed=s)))

    timer = StepTimer()
    with timer.time("init"):
        init_fn, step_fn = make_async_seed_runner(cfg, n_seeds=n_seeds,
                                                  dp=dp, tp=tp)
        states = init_fn(cfg.run.seed)

    save_every = max(1, cfg.run.max_episodes // cfg.run.save_every_fraction)
    is_nbc = uses_barrier(cfg.constraint.kind)
    try:
        _multi_seed_loop(cfg, n_seeds, output_root, quiet, seeds, loggers,
                         step_fn, states, save_every, is_nbc, timer)
    finally:
        for lg in loggers:
            lg.close()
    for phase, total in timer.summary().items():
        print(colorize(f"{phase}: {total}", "cyan"))
    return states


def _multi_seed_loop(cfg, n_seeds, output_root, quiet, seeds, loggers,
                     step_fn, states, save_every, is_nbc, timer):
    # per-seed best-checkpoint tracking (RunConfig.save_best_metric):
    # same trailing-window/after/strictly-greater semantics as train()
    best_metric = cfg.run.save_best_metric
    if best_metric is not None:
        from collections import deque
        maxlen = max(1, min(cfg.run.save_best_window,
                            cfg.run.max_episodes - cfg.run.save_best_after))
        best_windows = [deque(maxlen=maxlen) for _ in seeds]
        best_means = [None] * len(seeds)

    def process(i_episode, metrics, states):
        """Host-side per-episode work over FETCHED metrics: per-seed
        logging, the aggregate row, best-selection, cadence saves."""
        rewards = [float(m.reward) for m in metrics]
        for s, lg, m in zip(seeds, loggers, metrics):
            lg.store(Episode=i_episode, episode_steps=int(m.steps),
                     reward_train=float(m.reward),
                     cost_train=float(m.num_violations),
                     safety_cost_train=float(m.safety_cost),
                     goal_met=float(m.goal_met),
                     reached=float(m.reached))
            # same train-metric columns as single-seed train(): the
            # rho/lam_max columns exist so multiplier-driven collapse
            # is diagnosable from progress.txt alone, and the
            # multi-seed path is HOW the sweeps run — the data is
            # already on host via the pipelined fetch above
            train_cols = ["qf1_loss", "qf2_loss", "lf_loss",
                          "policy_loss", "alpha_loss", "alpha",
                          "node_loss", "rho", "lam_max"]
            if is_nbc:  # appended, as in single-seed train()
                train_cols.append("barrier_td_loss")
            for k in train_cols:
                lg.store(**{k: float(m.train[k])})
            for k in (["Episode", "episode_steps", "reward_train",
                       "cost_train", "safety_cost_train", "goal_met",
                       "reached"] + train_cols):
                lg.log_tabular(k)
            lg.dump_tabular()
        if not quiet:
            # Host-side stats over n_seeds floats already fetched by the
            # pipelined _to_host above: statistics_scalar is jnp-based
            # and would pay one H2D + 4 synchronous tunnel round trips
            # PER EPISODE (60ms-7s each in bad windows — the exact
            # per-episode sync-read pathology CLAUDE.md bans). Same
            # population-std convention (ddof=0) as statistics_scalar /
            # the reference's mpi_statistics_scalar.
            r = np.asarray(rewards)
            mean, std = float(r.mean()), float(r.std())
            lo, hi = float(r.min()), float(r.max())
            print(colorize(
                f"ep {i_episode:4d}  reward over {n_seeds} seeds: "
                f"{mean:9.2f} ± {std:7.2f}  [{lo:9.2f}, {hi:9.2f}]",
                "white"))
        if best_metric is not None and i_episode >= cfg.run.save_best_after:
            for j, (s, st, m) in enumerate(zip(seeds, states, metrics)):
                best_windows[j].append(
                    float(m.reward) if best_metric == "reward"
                    else float(m.goal_met))
                if len(best_windows[j]) != best_windows[j].maxlen:
                    continue
                cur = sum(best_windows[j]) / len(best_windows[j])
                if best_means[j] is None or cur > best_means[j]:
                    best_means[j] = cur
                    bdir = os.path.join(output_root, f"s{s}", "best")
                    save_model_weights(bdir, st[0],
                                       include_barrier=is_nbc)
                    with open(os.path.join(bdir, "best.json"), "w") as f:
                        json.dump({"episode": i_episode,
                                   "metric": best_metric,
                                   "window": len(best_windows[j]),
                                   "after": cfg.run.save_best_after,
                                   "value": cur, "seed": s}, f)

        if output_root is not None and (
                i_episode % save_every == 0
                or i_episode == cfg.run.max_episodes - 1):
            for s, st in zip(seeds, states):
                save_model_weights(os.path.join(output_root, f"s{s}"),
                                   st[0], include_barrier=is_nbc)

    # Pipelined episode loop (measured 1.48x on the 2-seed runner,
    # scripts/ab_pipelined_fetch.py: 275.9 -> 186.9 ms/episode medians,
    # matched seeds, phase-alternated on one chip): dispatch episode i
    # WITHOUT blocking, then fetch+process episode i-1's metrics — the
    # D2H round trip (60ms-7s through the tunnel) overlaps episode i's
    # device compute.  Snapshot semantics stay EXACT: weight-save
    # cadence episodes block before processing (so saved states are
    # post-that-episode), and --save_best forces the fully sequential
    # order (every episode can trigger a snapshot, which must see
    # pre-next-dispatch states).
    pipelined = best_metric is None
    pending = None  # (episode, un-fetched device metrics)
    for i_episode in range(cfg.run.max_episodes):
        phase = "episode_first" if i_episode == 0 else "episode"
        is_sync = (not pipelined
                   or (output_root is not None
                       and (i_episode % save_every == 0
                            or i_episode == cfg.run.max_episodes - 1)))
        with timer.time(phase):
            states, metrics = step_fn(states, i_episode, block=is_sync)
            if pending is not None:
                ep_prev, m_prev = pending
                pending = None
                process(ep_prev, _to_host(m_prev), states)
            if is_sync:
                process(i_episode, _to_host(metrics), states)
            else:
                pending = (i_episode, metrics)
    if pending is not None:
        process(pending[0], _to_host(pending[1]), states)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        # must land before ANY backend init (incl. init_distributed) —
        # the env-var route is unreliable under site platform hooks
        # (CLAUDE.md), the config update is not
        jax.config.update("jax_platforms", "cpu")
    # Arg-only cross-flag validation runs BEFORE jax.distributed
    # initialization: init_distributed blocks until every process joins,
    # so an invalid combination must fail loudly here, not hang the gang.
    if args.num_processes > 1:
        if not args.coordinator or args.process_id is None:
            raise SystemExit("--num_processes > 1 requires --coordinator "
                             "host:port and --process_id")
        if args.n_seeds > 1:
            raise SystemExit(
                "--n_seeds x --num_processes is not supported: the async "
                "seed runner lays seeds over this process's local "
                "devices; launch one seed per process instead")
    if args.dp < 1 or args.tp < 1:
        raise SystemExit("--dp/--tp must be >= 1")
    if (args.tp > 1 and args.hidden_size
            and args.hidden_size % args.tp != 0):
        # arg-only (pre-init_distributed) form of the tp divisibility
        # rule; the preset-default case is re-checked after the config
        # is built, below
        raise SystemExit(
            f"--tp {args.tp} requires --hidden_size ({args.hidden_size}) "
            f"to be divisible by the tp width (nothing would shard)")
    if args.host_loop:
        # Loud failures (same rule as eval mode below): the host-loop
        # trainer is single-seed/single-device, and the few remaining
        # fused-only features (profiling, best-window selection) must
        # not be silently ignored — misreporting what actually ran is
        # worse than exiting.
        if args.mode == "eval":
            raise SystemExit("--host_loop is a training flag; it has "
                             "no effect with --mode eval")
        if args.n_seeds > 1 or args.dp > 1 or args.tp > 1 \
                or args.num_processes > 1:
            raise SystemExit(
                "--host_loop is single-seed, single-device: --n_seeds/"
                "--dp/--tp/--num_processes are fused-device-mode flags")
        # --wandb/--tensorboard/--checkpoint/--resume are SUPPORTED in
        # host-loop mode since r5 (the reference's own host loop saves
        # mid-run and emits wandb per episode, UNI/main.py:153-165);
        # only genuinely-inapplicable flags remain rejected.  Presence
        # flags check truthiness; value-taking flags check `is not
        # None` so an explicit falsy value (--save_best_window 0) still
        # fails loudly (advisor r4).
        if args.save_best:
            raise SystemExit("--save_best is a fused-device-mode "
                             "feature; it is not supported with "
                             "--host_loop")
        for flag in ("profile_dir", "save_best_window", "save_best_after"):
            if getattr(args, flag, None) is not None:
                raise SystemExit(f"--{flag} is a fused-device-mode "
                                 f"feature; it is not supported with "
                                 f"--host_loop")
        # the native host data plane is load-bearing for this mode; fail
        # here, BEFORE any run dir / config.json is created (same
        # loud-SystemExit-before-output-dirs rule as the dp/tp checks)
        from nlbac_tpu import runtime_native
        if not runtime_native.native_available():
            raise SystemExit(
                "--host_loop needs the native host data plane "
                "(runtime/libnlbac_host.so) and it could not be built; "
                "run `make -C runtime` and check for a g++ toolchain")
    if args.mode == "eval":
        # Loud failure beats silent loss (same rule as the n_seeds>1
        # branch): these flags have no eval-mode meaning, and silently
        # ignoring e.g. --n_seeds would pass one seed's rollouts off as
        # a multi-seed result.
        for flag in ("resume", "checkpoint", "profile_dir", "wandb",
                     "tensorboard"):
            if getattr(args, flag, None):
                raise SystemExit(
                    f"--{flag} has no effect with --mode eval; drop it")
        if args.n_seeds > 1:
            raise SystemExit(
                "--n_seeds has no effect with --mode eval — evaluate "
                "each s<seed>/ run dir separately")
        if args.dp > 1 or args.tp > 1 or args.num_processes > 1:
            raise SystemExit("--dp/--tp/--num_processes are training "
                             "flags; they have no effect with --mode eval")
    # multi-host init next: jax.distributed.initialize must run before
    # any backend use so every process sees the global device set
    if args.num_processes > 1:
        from nlbac_tpu.parallel import init_distributed
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
    cfg = config_from_args(args)
    enable_compilation_cache()
    if (cfg.node.solver == "dopri5" and cfg.node.adaptive_impl == "while"
            and not args.host_loop and args.mode == "train"):
        # the adaptive-step while_loop nested inside the fused episode
        # program reproducibly crashes the axon remote compiler/device
        # (PARITY.md "NODE solver stack"); the same update runs fine
        # dispatched per-update. Warn (not error): other backends
        # compile the fused combination fine (CPU does). The scan impl
        # (--node_adaptive_impl scan) nests fine and is the supported
        # fused-program route.
        print(colorize(
            "note: --node_solver dopri5 with the default while_loop "
            "impl inside the FUSED episode program is known to crash "
            "the axon TPU backend (adaptive while_loop nesting); use "
            "--node_adaptive_impl scan (fused-program-safe), "
            "--host_loop, or --cpu", "yellow"))
    if args.mode == "eval":
        # evaluate reference-layout weights from --output (which then
        # points at a run directory, not a parent folder)
        from nlbac_tpu.agent import create_train_state
        from nlbac_tpu.train.checkpoint import load_model_weights
        from nlbac_tpu.utils.evaluate import run_policy
        ts = create_train_state(cfg, jax.random.PRNGKey(cfg.run.seed))
        ts = load_model_weights(args.output, ts,
                                include_barrier=uses_barrier(
                                    cfg.constraint.kind))
        run_policy(cfg, ts, episodes=5, seed=cfg.run.seed)
        return
    if args.host_loop:
        # Host-loop training mode: the preset env behind the reference's
        # host gym API, native C++ replay rings, device-side updates
        # (train/host_loop.py). Same output layout as train() — config
        # .json + progress.txt + final reference-layout weights, so
        # --mode eval and nlbac-plot read host-loop runs unchanged.
        from nlbac_tpu.envs import as_host_env, get_env
        from nlbac_tpu.train.driver import build_step_kwargs
        from nlbac_tpu.train.host_loop import train_host_env
        if (getattr(cfg.env, "spawn_curriculum_episodes", 0) > 0
                or getattr(cfg.env, "spawn_curriculum_mode",
                           "anneal") != "anneal"):
            raise SystemExit(
                "--host_loop does not support the spawn curriculum (the "
                "host gym API has no per-episode reset_curriculum "
                "channel); drop the --spawn_curriculum_* flags or use "
                "the fused device mode")
        env_module = get_env(cfg.env.name)
        adapter = as_host_env(
            env_module, seed=cfg.run.seed,
            barrier_B=cfg.env.barrier_B if cfg.env.barrier_signals else 0.0,
            barrier_b=cfg.env.barrier_b if cfg.env.barrier_signals else 0.0,
            max_episode_steps=cfg.env.max_episode_steps,
            step_kwargs=build_step_kwargs(cfg, env_module))
        out = get_output_folder(args.output, cfg.env.name)
        lk = setup_logger_kwargs(cfg.run.exp_name, cfg.run.seed,
                                 data_dir=out)
        logger = EpochLogger(lk["output_dir"], quiet=args.quiet)
        logger.save_config(cfg)
        sink = MetricsSink(
            logger=None,  # the EpochLogger row is emitted by the loop
            use_wandb=bool(args.wandb),
            wandb_project=args.wandb_project or cfg.run.exp_name,
            wandb_config=cfg.to_dict(),
            tensorboard_dir=(os.path.join(lk["output_dir"], "tb")
                             if args.tensorboard else None)
        ) if (args.wandb or args.tensorboard) else None
        checkpoint_path = args.checkpoint or (
            os.path.join(lk["output_dir"], "checkpoint.npz"))
        print(colorize(f"NLBAC-TPU preset={args.preset} "
                       f"env={cfg.env.name} "
                       f"backend={jax.default_backend()} host-loop "
                       f"-> {out}", "green", bold=True))
        try:
            ts, _history = train_host_env(
                cfg, adapter, logger=logger, quiet=args.quiet, sink=sink,
                weights_dir=lk["output_dir"],
                checkpoint_path=checkpoint_path, resume_path=args.resume)
        finally:
            if sink is not None:
                # same finalization as the fused path: the TensorBoard
                # SummaryWriter buffers events and a wandb run must be
                # finish()ed — without close() a short run's tail (or
                # all of it) is silently lost
                sink.close()
        save_model_weights(lk["output_dir"], ts,
                           include_barrier=uses_barrier(
                               cfg.constraint.kind))
        print(colorize(f"saved final weights -> {lk['output_dir']}",
                       "yellow"))
        return
    if args.dp * args.tp > 1 and jax.device_count() < args.dp * args.tp:
        raise SystemExit(f"--dp {args.dp} x --tp {args.tp} needs "
                         f"{args.dp * args.tp} devices; this "
                         f"process sees {jax.device_count()} "
                         f"({jax.default_backend()})")
    # clean failures BEFORE any output dir / per-seed logger is created
    # (the runner builders raise the same rules as ValueErrors — these
    # SystemExits keep CLI misuse from leaving half-made run dirs)
    if args.tp > 1 and cfg.sac.hidden_dim % args.tp != 0:
        raise SystemExit(
            f"--tp {args.tp} requires the hidden dim "
            f"({cfg.sac.hidden_dim}) to be divisible by the tp width "
            f"(nothing would shard — N devices of redundant work)")
    if args.dp > 1 and (cfg.sac.batch_size % args.dp != 0
                        or cfg.node.max_batch % args.dp != 0):
        raise SystemExit(
            f"--dp {args.dp} requires batch_size "
            f"({cfg.sac.batch_size}) and the NODE max_batch "
            f"({cfg.node.max_batch}) to be divisible by the dp width")
    # rank-0 gating (multi-host --dp): every process runs the same
    # program (GSPMD requires it), but only rank 0 owns the output dir,
    # progress.txt, and checkpoints — the reference's proc_id()==0
    # convention (UNI/utils/logx.py via mpi_tools.proc_id)
    from nlbac_tpu.parallel import is_rank0
    rank0 = is_rank0()
    out = get_output_folder(args.output, cfg.env.name) if rank0 else None
    if args.n_seeds > 1:
        # Loud failure beats silent loss: multi-seed has no checkpoint/
        # resume/profile/wandb path, and silently restarting from scratch
        # under --resume would overwrite per-seed weights in place.
        for flag in ("resume", "checkpoint", "profile_dir"):
            if getattr(args, flag, None):
                raise SystemExit(
                    f"--{flag} is a single-seed feature; it is not "
                    f"supported with --n_seeds > 1")
        if args.wandb:
            raise SystemExit("--wandb is a single-seed feature; it is "
                             "not supported with --n_seeds > 1")
        if args.tensorboard:
            raise SystemExit("--tensorboard is a single-seed feature; "
                             "it is not supported with --n_seeds > 1 "
                             "(per-seed progress.txt is the multi-seed "
                             "channel)")
        print(colorize(
            f"NLBAC-TPU preset={args.preset} env={cfg.env.name} "
            f"backend={jax.default_backend()} seeds={cfg.run.seed}.."
            f"{cfg.run.seed + args.n_seeds - 1} over "
            f"{jax.device_count()} device(s)"
            + (f" x dp={args.dp}" if args.dp > 1 else "")
            + (f" x tp={args.tp}" if args.tp > 1 else "")
            + f" -> {out}", "green", bold=True))
        train_multi_seed(cfg, args.n_seeds, out, quiet=args.quiet,
                         dp=args.dp, tp=args.tp)
        return
    lk = (setup_logger_kwargs(cfg.run.exp_name, cfg.run.seed, data_dir=out)
          if rank0 else {"output_dir": None})
    print(colorize(f"NLBAC-TPU preset={args.preset} env={cfg.env.name} "
                   f"backend={jax.default_backend()}"
                   + (f" dp={args.dp}" if args.dp > 1 else "")
                   + (f" tp={args.tp}" if args.tp > 1 else "")
                   + (f" rank={jax.process_index()}/{jax.process_count()}"
                      f" global_devices={jax.device_count()}"
                      if args.num_processes > 1 else "")
                   + f" -> {out}", "green", bold=True))
    train(cfg, output_dir=lk["output_dir"],
          quiet=args.quiet or not rank0,
          checkpoint_path=args.checkpoint if rank0 else None,
          profile_dir=args.profile_dir, resume_path=args.resume,
          dp=args.dp, tp=args.tp)


if __name__ == "__main__":
    main()
