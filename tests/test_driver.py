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
