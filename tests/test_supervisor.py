"""Backup-supervisor state-machine tests against the reference's trigger
semantics (UNI/main.py:109-142, CARS/main.py:102-112,
PVTOL/main.py:128-201)."""

import jax
import jax.numpy as jnp
import numpy as np

from nlbac_tpu.config import SupervisorConfig, get_config
from nlbac_tpu.envs.base import StepOut, zeros_out
from nlbac_tpu.envs import cars as cars_env
from nlbac_tpu.envs import unicycle as uni_env
from nlbac_tpu.train.supervisor import (backup_active, init_supervisor,
                                        post_step, pre_action)

T = jnp.array(True)
F = jnp.array(False)


def _uni_out(pos):
    return zeros_out(uni_env.SPEC)._replace(
        lyap_t1=jnp.asarray(pos, jnp.float32))


def test_trap_trigger_fires_after_8_consecutive_checks():
    cfg = get_config("unicycle").supervisor
    sup = init_supervisor(cfg)
    # 49 steps somewhere (moving), then stay put: after window fills with
    # the same position, 8 consecutive trapped checks fire the backup.
    step = 0
    for i in range(49):
        step += 1
        sup = post_step(cfg, sup, None, _uni_out([i * 0.1, 0.0]), step, T)
    assert not bool(sup.use_backup)
    fired_at = None
    for j in range(60):
        step += 1
        sup = post_step(cfg, sup, None, _uni_out([4.9, 0.0]), step, T)
        if bool(sup.use_backup):
            fired_at = j
            break
    # needs the 40-window to be stationary AND 8 consecutive detections
    assert fired_at is not None
    assert fired_at >= 7


def test_trap_exit_on_escape_distance():
    cfg = get_config("unicycle").supervisor
    sup = init_supervisor(cfg)
    step = 0
    for i in range(49):
        step += 1
        sup = post_step(cfg, sup, None, _uni_out([0.0, 0.0]), step, T)
    while not bool(sup.use_backup):
        step += 1
        sup = post_step(cfg, sup, None, _uni_out([0.0, 0.0]), step, T)
    # moved far from the anchor -> exit (escape_distance_sq = 0.6)
    step += 1
    sup = post_step(cfg, sup, None, _uni_out([1.0, 0.0]), step, T)
    assert not bool(sup.use_backup)
    assert int(sup.backup_time) == 0


def test_trap_exit_on_timeout():
    cfg = get_config("unicycle").supervisor
    sup = init_supervisor(cfg)
    step = 0
    for i in range(60):
        step += 1
        sup = post_step(cfg, sup, None, _uni_out([0.0, 0.0]), step, T)
    assert bool(sup.use_backup)
    n = 0
    while bool(sup.use_backup):
        active, sup = pre_action(cfg, sup, T)  # bumps backup_time
        assert bool(active)
        step += 1
        sup = post_step(cfg, sup, None, _uni_out([0.0, 0.0]), step, T)
        n += 1
        assert n < 50
    assert n == 30  # backup_max_steps


def test_supervisor_respects_start_gate():
    cfg = get_config("unicycle").supervisor
    sup = init_supervisor(cfg)
    for i in range(80):
        sup = post_step(cfg, sup, None, _uni_out([0.0, 0.0]), i + 1, F)
    assert not bool(sup.use_backup)
    assert not bool(backup_active(sup, F))


def _cars_out(x3, x4, x5, reached):
    obs = jnp.zeros(10).at[4].set(x3 / 100).at[6].set(x4 / 100).at[8].set(
        x5 / 100)
    return zeros_out(cars_env.SPEC)._replace(
        obs=obs, reached=jnp.float32(reached))


def test_cars_trigger_and_exit():
    cfg = get_config("cars").supervisor
    sup = init_supervisor(cfg)
    # gap45 < 2.5 while reached -> fire
    sup = post_step(cfg, sup, None, _cars_out(30.0, 20.0, 18.0, 1.0), 1, T)
    assert bool(sup.use_backup)
    # timeout after 15 backup steps
    for i in range(15):
        _, sup = pre_action(cfg, sup, T)
        sup = post_step(cfg, sup, None, _cars_out(30.0, 20.0, 18.0, 1.0),
                        i + 2, T)
    assert not bool(sup.use_backup)


def test_cars_early_exit_when_gaps_clear():
    cfg = get_config("cars").supervisor
    sup = init_supervisor(cfg)
    sup = post_step(cfg, sup, None, _cars_out(30.0, 20.0, 18.0, 1.0), 1, T)
    assert bool(sup.use_backup)
    n = 0
    # gaps now clear; exit requires >= 5 backup steps first
    while bool(sup.use_backup):
        _, sup = pre_action(cfg, sup, T)
        sup = post_step(cfg, sup, None, _cars_out(40.0, 30.0, 20.0, 0.0),
                        n + 2, T)
        n += 1
        assert n < 10
    assert n == 5


def test_pvtol_rush_trigger():
    from nlbac_tpu.envs import pvtol as pvtol_env
    cfg = get_config("pvtol").supervisor
    sup = init_supervisor(cfg)
    # moving right toward goal (x<=4.5, dx>0) while x - op > operator_dist
    obs_prev = jnp.zeros(11).at[0].set(1.0).at[7].set(0.0)
    obs = jnp.zeros(11).at[0].set(1.2).at[7].set(0.0)
    out = zeros_out(pvtol_env.SPEC)._replace(obs=obs)
    sup = post_step(cfg, sup, obs_prev, out, 51, T)
    assert bool(sup.use_backup_y)
    # comes back within 0.9 * operator_dist -> exit
    obs2 = jnp.zeros(11).at[0].set(0.5).at[7].set(0.0)
    out2 = zeros_out(pvtol_env.SPEC)._replace(obs=obs2)
    _, sup = pre_action(cfg, sup, T)
    sup = post_step(cfg, sup, obs, out2, 52, T)
    assert not bool(sup.use_backup_y)


def test_pre_action_increments_only_active_timer():
    cfg = get_config("pvtol").supervisor
    sup = init_supervisor(cfg)._replace(use_backup=jnp.array(True))
    active, sup = pre_action(cfg, sup, T)
    assert bool(active)
    assert int(sup.backup_time) == 1
    assert int(sup.backup_y_time) == 0
