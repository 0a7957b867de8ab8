"""2-D Quadrotor env (the reference's sixth workload).

The reference points this workload at a modified safe-control-gym
(README.md:66-72) whose submodule is EMPTY in the snapshot; its behavior
is documented only in README.md:185-195 (SURVEY.md §0): a 2-D quadrotor
must reach a destination while staying inside a pre-defined x/z range and
avoiding an obstacle; reward = -distance (also the cost/Lyapunov signal),
+250 on reaching the goal; NO pre-defined CBFs — a neural barrier
certificate is learned from barrier signals D1 = -1.0 when out of range
and D2 = -10.0 on collision; the NODE is non-affine with NORMALIZED
inputs (dim 8 = 6 state + 2 action) and denormalized outputs (dim 6).

Physics: the standard planar quadrotor of the safe-control-gym benchmark
(Yuan et al., 2022), Euler-integrated:

    state [x, vx, z, vz, theta, omega], action [T1, T2] (motor thrusts)
    ax = sin(theta) (T1+T2)/m,  az = cos(theta) (T1+T2)/m - g,
    alpha = L (T2-T1) / Iyy

Parameters are a generic planar quadrotor (the reference's submodule is
empty, so none are pinned): Crazyflie-2's Iyy makes raw-thrust attitude
control explode under random warm-up actions (hundreds of rad/s^2), which
no RL agent recovers from at dt=0.02.  Like safe-control-gym, episodes
also TERMINATE when the vehicle leaves a kill box well outside the
constraint range — without it random actions integrate the state to
unbounded positions and learning signal vanishes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nlbac_tpu.envs.base import EnvSpec, StepOut

MASS = 0.5
ARM = 0.2
IYY = 0.01
GRAVITY = 9.8
HOVER_T = MASS * GRAVITY / 2.0  # per motor
KILL_X = 3.0
KILL_Z = (-0.5, 3.0)

GOAL = np.array([1.0, 1.0], np.float32)  # (x, z)
GOAL_SIZE = 0.2
REWARD_GOAL = 250.0
X_RANGE = (-2.0, 2.0)
Z_RANGE = (0.05, 2.0)
OBSTACLE = np.array([0.0, 0.75], np.float32)
OBSTACLE_RADIUS = 0.2
INIT_STATE = np.array([-1.0, 0.0, 0.5, 0.0, 0.0, 0.0], np.float32)

# barrier signals (README.md:190-192)
BARRIER_OUT_OF_RANGE = -1.0  # D1
BARRIER_COLLISION = -10.0  # D2

SPEC = EnvSpec(
    name="quadrotor", obs_dim=6, action_dim=2, state_dim=6, lyap_dim=2,
    dt=0.02, max_episode_steps=1000,
    # hover +/- 30% per motor: enough authority to climb, descend and
    # pitch (theta_ddot up to ~29 rad/s^2) without random warm-up actions
    # instantly tumbling the vehicle into the kill box
    action_low=(0.7 * HOVER_T, 0.7 * HOVER_T),
    action_high=(1.3 * HOVER_T, 1.3 * HOVER_T),
)

# Normalization scales for the NODE (states/actions are normalized before
# entering the network, denormalized outputs; README.md:194-195)
STATE_SCALE = (2.0, 2.0, 2.0, 2.0, 1.0, 5.0)
ACTION_SCALE = (2.0 * HOVER_T, 2.0 * HOVER_T)


class QuadrotorState(NamedTuple):
    x: jnp.ndarray  # (6,)
    step: jnp.ndarray  # i32


def get_obs(x):
    return x


def _pos(x):
    return jnp.stack([x[0], x[2]])


def ground_probe_obs() -> jnp.ndarray:
    """Fixed probe batch around the ground spawn state (lever 18).

    The measured ground-start failure (PARITY.md r7) is a
    tanh-saturation trap AT the spawn observation: |pre-tanh mean|
    reaches 2-6 there, tanh' collapses to ~5e-5, and the policy
    gradient at the state is numerical noise — replay-averaged
    regularization (lever 16) cannot reach it because ground obs are a
    sliver of the batch. ``SacConfig.probe_pretanh_reg`` instead
    evaluates the mu^2 pull on this fixed batch every policy update:
    the exact spawn state plus single-coordinate perturbations covering
    the first take-off steps (position jitter, small climb, small
    attitude/rate excursions). Deterministic (no RNG) so the update
    program stays reproducible.
    """
    rows = [INIT_STATE]
    offsets = [
        (0, -0.05), (0, 0.05),   # x jitter (CURRICULUM_JITTER scale)
        (2, 0.05), (2, 0.15),    # small climb off the floor
        (1, -0.2), (1, 0.2),     # xdot
        (3, 0.2), (3, 0.4),      # zdot (ascent)
        (4, -0.2), (4, 0.2),     # theta: early banking band
        (5, -0.5), (5, 0.5),     # omega: pre-tumble rates
    ]
    for idx, dv in offsets:
        # INIT_STATE is a host numpy constant (import must not touch a
        # backend); build the jittable variant here
        rows.append(jnp.asarray(INIT_STATE).at[idx].add(dv))
    return jnp.stack([get_obs(x) for x in rows])


def reset(key, max_episode_steps: int = SPEC.max_episode_steps
          ) -> Tuple[QuadrotorState, jnp.ndarray]:
    del key
    st = QuadrotorState(x=INIT_STATE, step=jnp.int32(0))
    return st, get_obs(st.x)


# Reverse spawn curriculum: spawn just outside the goal ring early and
# anneal the spawn point back to INIT_STATE over ``curriculum_episodes``.
# Floor on the goal->spawn fraction so episode 0 does not spawn INSIDE
# the goal ring (|INIT_pos - GOAL| ~ 2.06, so 0.15 * 2.06 ~ 0.31 > the
# 0.2 goal radius) and the agent must actually fly to collect the +250.
CURRICULUM_ALPHA_MIN = 0.15
CURRICULUM_JITTER = 0.05
# Mix mode (lever 12, PARITY.md "Quadrotor"): after the anneal completes,
# every MIX_GROUND_INTERVAL-th episode is an EXACT ground start (alpha=1,
# bit-identical to the anneal's endpoint) and the rest draw a fresh
# alpha ~ Uniform(ALPHA_MIN, 1) per episode — permanent rehearsal of all
# spawn heights. The exact-ground cadence is deterministic in the episode
# index so analyzers can score ground-start retention from progress.txt
# alone (scripts/quad_goal_windows.py).
MIX_GROUND_INTERVAL = 3


def reset_curriculum(key, i_episode, curriculum_episodes: int,
                     max_episode_steps: int = SPEC.max_episode_steps,
                     mode: str = "anneal",
                     mix_alpha_min: float = CURRICULUM_ALPHA_MIN
                     ) -> Tuple[QuadrotorState, jnp.ndarray]:
    """Curriculum reset (opt-in via EnvConfig.spawn_curriculum_episodes).

    The take-off failure mode this targets (PARITY.md "Quadrotor"): most
    seeds never reach the goal ring from the ground start, so the +250
    goal reward is never observed and the policy settles into a hover/
    crash local optimum; warmup-, budget- and CLF-weighting levers were
    all measured negative. Spawning near the goal early guarantees goal
    encounters from episode 0, then the spawn anneals smoothly back to
    the standard INIT_STATE — for ``i_episode >= curriculum_episodes``
    this is bit-identical to ``reset`` (alpha clips to 1, jitter scales
    to 0). No reference analog (the quadrotor submodule is empty);
    default-off so the shipped preset's measured behavior is unchanged.

    ``mode`` (static, baked into the compiled program):
      - "anneal" (default): the behavior above, spawns pinned to the
        ground start once the anneal completes.
      - "mix" (lever 12): identical during the anneal (the alpha-draw
        key is ``fold_in(key, 1)``, so the jitter stream and hence the
        anneal-phase spawns are bit-identical to "anneal" mode); after
        it, a STATIONARY distribution over spawn heights — every
        ``MIX_GROUND_INTERVAL``-th episode an exact ground start, the
        rest alpha ~ Uniform(mix_alpha_min, 1). Motivated by the
        lever-11 finding that the policy forgets heights it no longer
        rehearses (PARITY.md): an anneal that ends is a moving target
        terminating at the hardest task.

    ``mix_alpha_min`` (static; mix mode only — lever 13): lower bound
    of the post-anneal alpha mixture. The default rehearses all
    heights; raising it (e.g. 0.6) concentrates rehearsal on the hard
    near-ground band where lever-12 measured the skill decaying under
    the uniform mixture (~12% of episodes in alpha 0.9-1).
    """
    if not (CURRICULUM_ALPHA_MIN <= mix_alpha_min < 1.0):
        raise ValueError(
            f"mix_alpha_min={mix_alpha_min} must lie in "
            f"[{CURRICULUM_ALPHA_MIN}, 1): below the floor the spawn "
            "lands inside the goal ring; at 1 the mixture degenerates "
            "to ground-only (use mode='anneal' for that)")
    if curriculum_episodes <= 0:
        # 0/0 inside the clip would make alpha (and every spawn
        # coordinate downstream) NaN — a silent poisoned episode. The
        # driver gates its own call on eps > 0; direct API callers get
        # the same loud contract.
        raise ValueError(
            f"curriculum_episodes={curriculum_episodes} must be > 0 "
            "(use reset() for the plain ground spawn)")
    alpha = jnp.clip(i_episode.astype(jnp.float32)
                     / jnp.float32(curriculum_episodes),
                     CURRICULUM_ALPHA_MIN, 1.0)
    if mode in ("mix", "mix_early"):
        u = jax.random.uniform(jax.random.fold_in(key, 1), (),
                               minval=mix_alpha_min, maxval=1.0)
        ground = (i_episode % MIX_GROUND_INTERVAL) == 0
        post = i_episode >= curriculum_episodes
        if mode == "mix":
            mix_alpha = jnp.where(ground, jnp.float32(1.0), u)
            alpha = jnp.where(post, mix_alpha, alpha)
        else:
            # mix_early (lever 17): the ground cadence runs from
            # EPISODE 0, so the random-warmup / high-entropy phase sees
            # ground states too (the plain curriculum removes them from
            # start_steps entirely — yet the one seed with organic
            # ground take-off acquired it exactly from early random
            # exploration, PARITY.md). Off-cadence episodes follow the
            # anneal, then the stationary uniform mixture.
            alpha = jnp.where(ground, jnp.float32(1.0),
                              jnp.where(post, u, alpha))
    elif mode != "anneal":
        raise ValueError(f"unknown spawn curriculum mode {mode!r} "
                         "(anneal | mix | mix_early)")
    pos = _arc_pos(alpha)
    jitter = (1.0 - alpha) * jax.random.uniform(
        key, (2,), minval=-CURRICULUM_JITTER, maxval=CURRICULUM_JITTER)
    pos = pos + jitter
    x = jnp.stack([pos[0], jnp.float32(0.0), pos[1], jnp.float32(0.0),
                   jnp.float32(0.0), jnp.float32(0.0)])
    st = QuadrotorState(x=x, step=jnp.int32(0))
    return st, get_obs(st.x)


def _arc_pos(alpha):
    """The (x, z) spawn point at ``alpha`` on the curriculum arc — the
    ONE definition shared by :func:`reset_curriculum` (which adds
    jitter on top) and :func:`spawn_at_alpha` (jitter-free eval).

    The straight goal->init segment passes through the OBSTACLE at
    (0, 0.75) (it is almost exactly the midpoint), so arc the spawn
    path over it: a vertical clearance bump peaking mid-path (z+0.45 at
    alpha=0.5, well above the 0.95 obstacle top, inside Z_RANGE) that
    vanishes at both ends — alpha=1 stays bit-identical to INIT_STATE."""
    a = jnp.asarray(alpha, jnp.float32)  # python float OR traced array
    init_pos = jnp.stack([INIT_STATE[0], INIT_STATE[2]])
    pos = GOAL + a * (init_pos - GOAL)
    return pos.at[1].add(0.45 * 4.0 * a * (1.0 - a))


def spawn_at_alpha(alpha) -> Tuple[QuadrotorState, jnp.ndarray]:
    """Deterministic (jitter-free) reset at a point on the curriculum
    spawn arc: ``alpha=1`` is bit-identical to :func:`reset` (the exact
    ground start), ``alpha -> 0`` approaches the goal ring, and the
    mid-path clearance bump over the obstacle is included. This is the
    in-flight evaluation spawn for policies trained with
    ``spawn_curriculum_mode='mix'`` (PARITY.md levers 12/18) — the
    stock :func:`reset` only ever measures the hardest spawn."""
    pos = _arc_pos(alpha)
    x = jnp.stack([pos[0], jnp.float32(0.0), pos[1], jnp.float32(0.0),
                   jnp.float32(0.0), jnp.float32(0.0)])
    st = QuadrotorState(x=x, step=jnp.int32(0))
    return st, get_obs(st.x)


def dynamics(x, u):
    """Continuous-time planar-quadrotor derivative."""
    t_tot = (u[0] + u[1]) / MASS
    return jnp.stack([
        x[1], jnp.sin(x[4]) * t_tot,
        x[3], jnp.cos(x[4]) * t_tot - GRAVITY,
        x[5], ARM * (u[1] - u[0]) / IYY,
    ])


def step(state: QuadrotorState, action, *, barrier_B: float = 0.0,
         barrier_b: float = 0.0,
         max_episode_steps: int = SPEC.max_episode_steps,
         kill_penalty: float = 0.0,
         kill_attitude: float = 0.0
         ) -> Tuple[QuadrotorState, StepOut]:
    del barrier_B, barrier_b  # this env defines its own barrier signals
    f32 = jnp.float32
    x = state.x
    lyap_t = _pos(x)

    x_new = x + SPEC.dt * dynamics(x, action)
    step_count = state.step + 1
    pos = _pos(x_new)

    dist = jnp.linalg.norm(pos - GOAL)
    reward = -dist  # minimize distance (README.md:190)
    goal_met = dist <= GOAL_SIZE
    reward = reward + jnp.where(goal_met, REWARD_GOAL, 0.0)
    killed = jnp.logical_or(
        jnp.abs(x_new[0]) > KILL_X,
        jnp.logical_or(x_new[2] < KILL_Z[0], x_new[2] > KILL_Z[1]))
    if kill_attitude:
        # Opt-in attitude termination (EnvConfig.kill_attitude, radians;
        # 0 = off, every preset default). The real safe-control-gym
        # terminates on attitude as well as position; without it nothing
        # opposes attitude divergence (reward is -distance, kill box is
        # x/z only, barrier signals ignore theta) and the learned
        # behavior family is ballistic tumble-throws — omega 8-11 rad/s,
        # theta past 3.5 rad — which fail exactly at the ground start
        # (PARITY.md r7 "Ground-start failure diagnosed spatially").
        # Combined with kill_penalty, every tumble onset becomes an
        # immediate terminal penalty.
        killed = jnp.logical_or(killed,
                                jnp.abs(x_new[4]) > kill_attitude)
    # Opt-in crash penalty (EnvConfig.kill_penalty, default 0 = off).
    # Without it, diving into the kill box is a strong local optimum:
    # the reward is -dist every step, so a 34-step crash (total ~ -65)
    # strictly beats hovering (~ -190 discounted at gamma=0.99), and only
    # goal discovery (+250) beats crashing.  4/6 seeds learn exactly this
    # suicide policy (PARITY.md "Quadrotor": every episode terminates at
    # 34 steps in the ground kill box).  Penalizing the kill transition
    # by >= ~135 reorders crash below hover so the -dist gradient toward
    # the goal can act.  Mirror of the +250 goal bonus; no reference
    # analog (the quadrotor submodule is empty).
    reward = reward - jnp.where(killed, jnp.float32(kill_penalty), 0.0)
    done = jnp.logical_or(jnp.logical_or(goal_met, killed),
                          step_count >= max_episode_steps)

    out_of_range = jnp.logical_or(
        jnp.logical_or(x_new[0] < X_RANGE[0], x_new[0] > X_RANGE[1]),
        jnp.logical_or(x_new[2] < Z_RANGE[0], x_new[2] > Z_RANGE[1]))
    d_obs = jnp.linalg.norm(pos - OBSTACLE)
    collision = d_obs < OBSTACLE_RADIUS

    barrier = (out_of_range.astype(f32) * BARRIER_OUT_OF_RANGE
               + collision.astype(f32) * BARRIER_COLLISION)
    n_viol = out_of_range.astype(f32) + collision.astype(f32)
    cost = (out_of_range.astype(f32)
            * (jnp.maximum(X_RANGE[0] - x_new[0], 0.0)
               + jnp.maximum(x_new[0] - X_RANGE[1], 0.0)
               + jnp.maximum(Z_RANGE[0] - x_new[2], 0.0)
               + jnp.maximum(x_new[2] - Z_RANGE[1], 0.0))
            + collision.astype(f32)
            * (OBSTACLE_RADIUS - d_obs) / OBSTACLE_RADIUS)

    out = StepOut(
        obs=get_obs(x_new), reward=f32(reward), constraint=f32(dist),
        lyap_t=lyap_t, lyap_t1=pos, barrier_signal=f32(barrier),
        done=done, goal_met=goal_met, reached=f32(0.0),
        num_violations=n_viol, safety_cost=f32(cost),
        # slot 0 carries the per-step TOTAL (the base.py convention
        # unicycle/cars follow); families in slots 1-2
        viol_breakdown=jnp.stack([n_viol, collision.astype(f32),
                                  out_of_range.astype(f32), f32(0)]),
        cost_breakdown=jnp.stack([f32(cost), f32(0), f32(0), f32(0)]),
    )
    return QuadrotorState(x=x_new, step=step_count), out


def obs_to_state(obs):
    """obs == state for this env (6-d)."""
    return obs


def state_to_obs(state):
    return state
