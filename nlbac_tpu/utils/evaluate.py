"""Policy evaluator: load a trained agent and run (optionally rendered)
evaluation rollouts.

Capability parity with UNI/utils/test_policy.py:11-152 — which the
reference vendors but never wires to its own checkpoint format
(SURVEY.md §4).  This one actually loads this framework's checkpoints,
rolls out the DETERMINISTIC policy head (evaluate=True semantics,
UNI/sac_cbf_clf/sac_cbf_clf.py:149-152), and reports per-episode
return/length/violations; ``--render`` writes frames/video.

Usage:
    python -m nlbac_tpu.utils.evaluate RUN_DIR --preset unicycle \
        --episodes 5 [--render out.mp4]
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# nlbac_tpu imports are deliberately deferred into the functions below:
# several env modules build jnp constants at import time, which
# initializes the JAX backend — and ``--cpu`` only works if
# ``jax.config.update("jax_platforms", "cpu")`` runs BEFORE any backend
# init (CLAUDE.md; merely importing jax/jax.numpy is safe, creating
# arrays is not). With eager imports the flag silently evaluated over
# the TPU tunnel anyway.


def aggregate(results):
    """Per-key means over per-episode result dicts — the ONE place the
    aggregation lives (printed summary and --json both use it)."""
    return {k: float(np.mean([r[k] for r in results]))
            for k in ("return", "length", "violations")}


def run_policy(cfg, ts, episodes: int = 5, seed: int = 0,
               render_path: Optional[str] = None, deterministic=True,
               display: bool = False, spawn_alpha: Optional[float] = None):
    from nlbac_tpu.agent import action_spec
    from nlbac_tpu.envs import get_env
    from nlbac_tpu.nn import gaussian_policy_sample

    env = get_env(cfg.env.name)
    spec = action_spec(cfg)
    if spawn_alpha is not None:
        if cfg.env.name != "quadrotor":
            raise ValueError("--spawn_alpha is quadrotor-only (the "
                             f"spawn arc of its mix curriculum); env "
                             f"is {cfg.env.name!r}")
        from nlbac_tpu.envs.quadrotor import CURRICULUM_ALPHA_MIN
        if not (CURRICULUM_ALPHA_MIN <= spawn_alpha <= 1.0):
            # same floor reset_curriculum clips to: below ~0.097 the
            # arc point is INSIDE the goal ring (instant fake +250),
            # and outside [0,1] is off the arc entirely
            raise ValueError(
                f"--spawn_alpha {spawn_alpha} must lie in "
                f"[{CURRICULUM_ALPHA_MIN}, 1.0] (the training arc)")

    # Evaluation must run under the PRESET'S episode semantics, not
    # step()'s defaults: the quadrotor preset ships kill_penalty=250
    # (and recipes add kill_attitude) — without these a crash episode
    # reports a much milder return than the training numbers it is
    # compared to, and an attitude-killed policy tumbles on for the
    # full step budget. Same opt-in gating as train/driver.py:135-152.
    step_kwargs = {}
    for kw in ("kill_penalty", "kill_attitude"):
        val = getattr(cfg.env, kw, 0.0)
        if val:
            import inspect
            if kw not in inspect.signature(env.step).parameters:
                raise ValueError(
                    f"{kw}={val} but env {cfg.env.name!r} does not "
                    f"accept it")
            step_kwargs[kw] = val

    # tracked-state width: the env's physical state dim (floor of 12
    # keeps the layout of archived evals; the old hard-coded 12 broke
    # conforming register_env envs with wider states)
    track_width = max(12, env.SPEC.state_dim)

    @jax.jit
    def rollout(policy, key):
        key, krst = jax.random.split(key)
        st, obs = env.reset(krst,
                            max_episode_steps=cfg.env.max_episode_steps)
        if spawn_alpha is not None:
            from nlbac_tpu.envs import quadrotor as quad
            st, obs = quad.spawn_at_alpha(spawn_alpha)

        def cond(c):
            return ~c[2]

        def body(c):
            st, obs, done, key, reward, steps, viol, states = c
            key, k = jax.random.split(key)
            a_s, _, a_det = gaussian_policy_sample(policy, obs[None], k,
                                                   spec)
            a = a_det[0] if deterministic else a_s[0]
            st, out = env.step(st, a,
                               max_episode_steps=cfg.env.max_episode_steps,
                               **step_kwargs)
            states = jax.lax.dynamic_update_index_in_dim(
                states, _track(st), steps, axis=0)
            return (st, out.obs, out.done, key, reward + out.reward,
                    steps + 1, viol + out.num_violations, states)

        def _track(st):
            # built-in env states expose .x; a registered third-party
            # state tracks its first array leaf (best-effort trace for
            # rendering — the contract does not require a field name)
            x = st.x if hasattr(st, "x") else jax.tree.leaves(st)[0]
            x = jnp.ravel(x)[:track_width]
            full = jnp.zeros((track_width,), jnp.float32)
            return full.at[:x.shape[0]].set(x)

        states0 = jnp.zeros((cfg.env.max_episode_steps, track_width),
                            jnp.float32)
        out = jax.lax.while_loop(cond, body,
                                 (st, obs, jnp.array(False), key,
                                  jnp.float32(0), jnp.int32(0),
                                  jnp.float32(0), states0))
        return out[4], out[5], out[6], out[7]

    results = []
    frames = []
    viewer = None
    if display:  # mode='human' equivalent (pyglet Viewer parity)
        from nlbac_tpu.envs.render import LiveViewer
        viewer = LiveViewer(cfg.env.name)
    for ep in range(episodes):
        r, n, v, states = rollout(ts.policy, jax.random.PRNGKey(seed + ep))
        # ONE pipelined D2H fetch per episode (CLAUDE.md: bare
        # float()/int() reads each pay a tunnel round trip)
        from nlbac_tpu.train.checkpoint import _to_host
        r, n, v, states = _to_host((r, n, v, states))
        n = int(n)
        results.append({"return": float(r), "length": n,
                        "violations": float(v)})
        print(f"eval ep {ep}: return={float(r):.2f} len={n} "
              f"violations={float(v):.0f}")
        want_frames = render_path and ep == 0
        if viewer is not None or want_frames:
            from nlbac_tpu.envs.render import render
            traj = np.asarray(states[:n])
            stride = max(1, n // 150)
            for i in range(0, n, stride):
                if viewer is not None:
                    viewer.show(traj[i], trajectory=traj[:i + 1])
                if want_frames:
                    frames.append(render(cfg.env.name, traj[i],
                                         trajectory=traj[:i + 1]))
    if viewer is not None:
        viewer.close()
    if render_path and frames:
        from nlbac_tpu.envs.render import save_video
        out = save_video(frames, render_path)
        print(f"wrote {out}")
    print(f"mean over {episodes} eps: {aggregate(results)}")
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description="evaluate a trained policy")
    p.add_argument("run_dir", help="directory with actor.pkl etc.")
    p.add_argument("--preset", default="unicycle")
    p.add_argument("--episodes", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--render", default=None)
    p.add_argument("--display", action="store_true",
                   help="live interactive window while evaluating "
                        "(mode='human'; falls back to frame collection "
                        "on headless hosts)")
    p.add_argument("--stochastic", action="store_true")
    p.add_argument("--spawn_alpha", type=float, default=None,
                   help="quadrotor-only: spawn on the mix-curriculum "
                        "arc instead of the ground (1.0 = exact ground "
                        "start, smaller = closer to the goal). The "
                        "in-flight competence metric the mix-trained "
                        "best/ snapshots actually optimize")
    p.add_argument("--json", default=None, metavar="PATH",
                   help="also write the per-episode results and their "
                        "means as JSON (machine-readable channel for "
                        "CI-style gates on return/violations)")
    p.add_argument("--cpu", action="store_true",
                   help="evaluate on the host CPU so the rollout never "
                        "contends with a training run for the TPU tunnel "
                        "(a queued second axon client stalls both — "
                        "CLAUDE.md; env-var JAX_PLATFORMS=cpu does not "
                        "override the plugin, the config update does)")
    args = p.parse_args(argv)

    if args.cpu:
        # must precede the nlbac_tpu imports below — they build jnp
        # constants at import time, which pins the backend
        jax.config.update("jax_platforms", "cpu")
    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.config import get_config
    from nlbac_tpu.constraints import uses_barrier
    from nlbac_tpu.train.checkpoint import load_model_weights

    cfg = get_config(args.preset)
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    ts = load_model_weights(args.run_dir, ts,
                            include_barrier=uses_barrier(
                                cfg.constraint.kind))
    results = run_policy(cfg, ts, episodes=args.episodes, seed=args.seed,
                         render_path=args.render, display=args.display,
                         deterministic=not args.stochastic,
                         spawn_alpha=args.spawn_alpha)
    if args.json:
        import json

        means = aggregate(results)
        with open(args.json, "w") as f:
            json.dump({"preset": args.preset, "run_dir": args.run_dir,
                       "seed": args.seed,
                       "deterministic": not args.stochastic,
                       "episodes": results, "mean": means}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
