"""Backup-controller supervisor: the reference's failure-detection /
recovery subsystem as a pure state machine (SURVEY.md §5).

Three trigger variants, selected by config:

- ``trap`` (Unicycle, UNI/main.py:109-142): if the displacement over the
  last 40 positions stays <= 0.01 for 8 consecutive checks, switch to the
  backup controller; switch back after 30 backup steps or once displaced
  >= 0.6 from the switch anchor.
- ``cars_gap`` (CARS/main.py:102-112): switch when the car-4/5 gap
  (next_obs[6]*100 - next_obs[8]*100) < 2.5 while the desired region is
  reached; back after 15 steps, or after >= 5 steps once both gaps clear
  2.5.
- ``pvtol`` (PVTOL/main.py:128-201): the trap machine (thresholds 0.015 /
  1.0) PLUS an operator-rush machine (moving toward the goal while
  violating the operator distance); two separate timers.

State lives in a fixed-size ring buffer + counters so the whole machine
runs inside the jitted episode loop.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nlbac_tpu.config import SupervisorConfig
from nlbac_tpu.envs.base import StepOut


class SupervisorState(NamedTuple):
    positions: jnp.ndarray  # (window, 2) ring of recent positions
    ptr: jnp.ndarray  # i32, next write slot
    use_backup: jnp.ndarray  # bool (trap / cars machine)
    use_backup_y: jnp.ndarray  # bool (pvtol rush machine)
    backup_time: jnp.ndarray  # i32
    backup_y_time: jnp.ndarray  # i32
    violation_time: jnp.ndarray  # i32
    violation_y_time: jnp.ndarray  # i32
    anchor: jnp.ndarray  # (2,) switch-time position


def init_supervisor(cfg: SupervisorConfig) -> SupervisorState:
    return SupervisorState(
        positions=jnp.zeros((cfg.window, 2), jnp.float32),
        ptr=jnp.int32(0),
        use_backup=jnp.array(False), use_backup_y=jnp.array(False),
        backup_time=jnp.int32(0), backup_y_time=jnp.int32(0),
        violation_time=jnp.int32(0), violation_y_time=jnp.int32(0),
        anchor=jnp.zeros((2,), jnp.float32),
    )


def backup_active(sup: SupervisorState, start) -> jnp.ndarray:
    """Whether the NEXT action comes from the backup controller."""
    return jnp.logical_and(
        jnp.logical_or(sup.use_backup, sup.use_backup_y), start)


def pre_action(cfg: SupervisorConfig, sup: SupervisorState, start
               ) -> Tuple[jnp.ndarray, SupervisorState]:
    """Called at action-selection time: returns the backup flag and bumps
    the backup timers exactly as the reference's selection branch does
    (UNI/main.py:77-79, PVTOL/main.py:79-89)."""
    if cfg.kind == "none":
        # No trigger machine (NBC variants, SURVEY §2.2 'Backup
        # controller: none'): return a LITERAL False so the driver's
        # backup-action select constant-folds and the per-step backup
        # MLP apply is dead code to XLA.
        return jnp.array(False), sup
    active = backup_active(sup, start)
    inc_obs = jnp.logical_and(active, sup.use_backup).astype(jnp.int32)
    inc_y = jnp.logical_and(active, sup.use_backup_y).astype(jnp.int32)
    return active, sup._replace(backup_time=sup.backup_time + inc_obs,
                                backup_y_time=sup.backup_y_time + inc_y)


def _push_position(sup: SupervisorState, pos2):
    positions = jax.lax.dynamic_update_index_in_dim(
        sup.positions, pos2, sup.ptr, axis=0)
    window = sup.positions.shape[0]
    return sup._replace(positions=positions, ptr=(sup.ptr + 1) % window)


def _window_displacement_sq(sup: SupervisorState):
    """||p_newest - p_oldest||^2 over the full ring (newest = slot just
    written, oldest = 39 steps back)."""
    window = sup.positions.shape[0]
    newest = sup.positions[(sup.ptr - 1) % window]
    oldest = sup.positions[sup.ptr % window]
    d = newest - oldest
    return jnp.sum(jnp.square(d))


def _trap_machine(cfg: SupervisorConfig, sup: SupervisorState, pos2,
                  episode_steps, start):
    """The shared trapped-position machine (UNI and PVTOL-obs)."""
    sup = _push_position(sup, pos2)
    checking = episode_steps >= cfg.min_steps
    disp2 = _window_displacement_sq(sup)

    # trigger branch (when not currently using backup)
    trapped = disp2 <= cfg.trap_threshold
    can_check = jnp.logical_and(checking,
                                jnp.logical_and(start,
                                                ~sup.use_backup))
    vt = jnp.where(jnp.logical_and(can_check, trapped),
                   sup.violation_time + 1, sup.violation_time)
    fire = jnp.logical_and(can_check, vt >= cfg.trap_count)
    vt = jnp.where(fire, 0, vt)
    vt = jnp.where(jnp.logical_and(can_check, ~trapped), 0, vt)
    use_backup = jnp.logical_or(sup.use_backup, fire)
    anchor = jnp.where(fire, pos2, sup.anchor)

    # exit branch (when using backup)
    exiting_ctx = jnp.logical_and(checking,
                                  jnp.logical_and(start, use_backup))
    timeout = sup.backup_time >= cfg.backup_max_steps
    escaped = jnp.sum(jnp.square(pos2 - anchor)) >= cfg.escape_distance_sq
    stop = jnp.logical_and(exiting_ctx, jnp.logical_or(timeout, escaped))
    # a freshly-fired trigger isn't immediately exited (fire implies the
    # anchor == pos2, so escaped is False; timeout applies to prior runs)
    use_backup = jnp.logical_and(use_backup, ~stop)
    backup_time = jnp.where(stop, 0, sup.backup_time)

    return sup._replace(use_backup=use_backup, violation_time=vt,
                        backup_time=backup_time, anchor=anchor)


def _cars_machine(cfg: SupervisorConfig, sup: SupervisorState,
                  out: StepOut, start):
    obs = out.obs
    gap34 = obs[4] * 100.0 - obs[6] * 100.0
    gap45 = obs[6] * 100.0 - obs[8] * 100.0

    trigger = jnp.logical_and(gap45 < cfg.cars_gap, out.reached != 0)
    fire = jnp.logical_and(jnp.logical_and(start, ~sup.use_backup), trigger)
    use_backup = jnp.logical_or(sup.use_backup, fire)

    in_backup = jnp.logical_and(start, use_backup)
    timeout = sup.backup_time >= cfg.cars_backup_max_steps
    cleared = jnp.logical_and(
        sup.backup_time >= cfg.cars_min_backup_steps,
        jnp.logical_and(gap34 > cfg.cars_gap, gap45 > cfg.cars_gap))
    stop = jnp.logical_and(in_backup, jnp.logical_or(timeout, cleared))
    use_backup = jnp.logical_and(use_backup, ~stop)
    backup_time = jnp.where(stop, 0, sup.backup_time)
    return sup._replace(use_backup=use_backup, backup_time=backup_time)


def _pvtol_rush_machine(cfg: SupervisorConfig, sup: SupervisorState,
                        obs_prev, obs, episode_steps, start):
    """Operator-rush trigger (PVTOL/main.py:175-201): rushing toward the
    goal while exceeding the operator distance."""
    checking = episode_steps >= cfg.min_steps
    x, x_prev, op = obs[0], obs_prev[0], obs[7]
    od = cfg.operator_dist
    rushing = jnp.logical_or(
        jnp.logical_and(jnp.logical_and(x <= 4.5, x - x_prev > 0),
                        x - op > od),
        jnp.logical_and(jnp.logical_and(x > 4.5, x - x_prev < 0),
                        op - x > od))

    can_check = jnp.logical_and(checking,
                                jnp.logical_and(start, ~sup.use_backup_y))
    vt = jnp.where(jnp.logical_and(can_check, rushing),
                   sup.violation_y_time + 1, sup.violation_y_time)
    fire = jnp.logical_and(can_check, vt >= 1)
    vt = jnp.where(fire, 0, vt)
    vt = jnp.where(jnp.logical_and(can_check, ~rushing), 0, vt)
    use_y = jnp.logical_or(sup.use_backup_y, fire)

    in_backup = jnp.logical_and(checking,
                                jnp.logical_and(start, use_y))
    timeout = sup.backup_y_time >= cfg.rush_backup_max_steps
    safe_again = jnp.logical_or(
        jnp.logical_and(x <= 4.5, x - op <= 0.9 * od),
        jnp.logical_and(x > 4.5, op - x <= 0.9 * od))
    stop = jnp.logical_and(in_backup, jnp.logical_or(timeout, safe_again))
    use_y = jnp.logical_and(use_y, ~stop)
    backup_y_time = jnp.where(stop, 0, sup.backup_y_time)
    return sup._replace(use_backup_y=use_y, violation_y_time=vt,
                        backup_y_time=backup_y_time)


def post_step(cfg: SupervisorConfig, sup: SupervisorState, obs_prev,
              out: StepOut, episode_steps, start) -> SupervisorState:
    """Advance the trigger machine after an env step.

    ``episode_steps`` is the post-increment step count; ``obs_prev`` the
    observation before the step (PVTOL's rush machine compares motion
    direction across the step)."""
    if cfg.kind == "none":
        return sup
    if cfg.kind == "trap":
        return _trap_machine(cfg, sup, out.lyap_t1, episode_steps, start)
    if cfg.kind == "cars_gap":
        return _cars_machine(cfg, sup, out, start)
    if cfg.kind == "pvtol":
        sup = _trap_machine(cfg, sup, out.obs[:2], episode_steps, start)
        return _pvtol_rush_machine(cfg, sup, obs_prev, out.obs,
                                   episode_steps, start)
    raise ValueError(f"unknown supervisor kind {cfg.kind!r}")
