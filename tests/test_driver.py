"""Driver-level config validation tests (make_episode_runner build-time
checks: flags that would otherwise fail deep inside the jit trace or
silently change experiment semantics)."""

import dataclasses as dc

import pytest

from nlbac_tpu.config import get_config
from nlbac_tpu.train.driver import make_episode_runner


def test_supervisor_requires_backup_policy():
    """supervisor.kind != 'none' with constraint.use_backup=False is
    rejected at runner-build time: the supervisor would 'engage' a backup
    controller that select_action statically never samples (agent/
    update.py select_action elides the backup apply for no-backup
    variants). No preset mixes these."""
    cfg = get_config("nbc_unicycle")  # use_backup=False, kind='none': ok
    assert cfg.supervisor.kind == "none"
    cfg_bad = dc.replace(
        cfg, supervisor=dc.replace(cfg.supervisor, kind="trap"))
    with pytest.raises(ValueError, match="use_backup"):
        make_episode_runner(cfg_bad)


def test_episode_program_op_count_regression():
    """The episode program is latency-bound on OP COUNT, not FLOPs
    (CLAUDE.md perf notes: every measured win came from removing ops —
    replay packing, gather gating — and every loss from adding them).
    Guard the traced unicycle program's StableHLO op count against
    silent graph bloat, with generous headroom for jax-version drift.
    Re-baseline deliberately (with an interleaved A/B on the TPU) if
    this fires after an intentional change."""
    import re

    import jax
    import jax.numpy as jnp

    from nlbac_tpu.agent import create_train_state
    from nlbac_tpu.train.driver import create_replays

    cfg = get_config("unicycle")
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg)
    lowered = jax.jit(make_episode_runner(cfg)).lower(
        ts, rl, node, jax.random.PRNGKey(0), jnp.int32(0), jnp.int32(0))
    ops = len(re.findall(r"^\s+%?[\w.]+ = ", lowered.as_text(), re.M))
    # recorded 10617 ops (jax in this image); +15% headroom
    assert ops < 12200, (
        f"unicycle episode program grew to {ops} StableHLO ops "
        f"(recorded baseline 10617): something added ops to the hot "
        f"loop — A/B it on the TPU before accepting")
