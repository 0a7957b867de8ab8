"""AOT episode-program cache (train/aot.py): the serialized lowered
module must reproduce the plain jit path bit-for-bit, and the cache file
must round-trip through deserialization."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.config import ReplayConfig, get_config
from nlbac_tpu.train.aot import cached_episode_runner, register_export_types
from nlbac_tpu.train.driver import create_replays, make_episode_runner


def _tiny_cfg():
    cfg = get_config("unicycle")
    return dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, max_episode_steps=8),
        sac=dataclasses.replace(cfg.sac, hidden_dim=16, batch_size=8,
                                updates_per_step=1, start_steps=4),
        node=dataclasses.replace(cfg.node, hidden_dim=8,
                                 f_hidden_layers=1, g_hidden_layers=1,
                                 max_batch=8, update_interval=2),
        replay=ReplayConfig(capacity=64, node_capacity=64),
    )


def test_aot_runner_matches_plain_jit(tmp_path):
    cfg = _tiny_cfg()
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg)
    args = (ts, rl, node, jax.random.PRNGKey(1), jnp.int32(0),
            jnp.int32(0))

    plain = jax.jit(make_episode_runner(cfg))
    ref = plain(*args)

    cache = str(tmp_path / "aot")
    run = cached_episode_runner(cfg, args, cache_dir=cache)
    got = run(*args)

    files = os.listdir(cache)
    assert len(files) == 1 and files[0].endswith(".jaxexport")

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # second construction must LOAD the serialized module (same file,
    # not a re-export) and still bit-match
    mtime = os.path.getmtime(os.path.join(cache, files[0]))
    run2 = cached_episode_runner(cfg, args, cache_dir=cache)
    got2 = run2(*args)
    assert os.path.getmtime(os.path.join(cache, files[0])) == mtime
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aot_cache_key_separates_configs(tmp_path):
    register_export_types()
    cfg1 = _tiny_cfg()
    cfg2 = dataclasses.replace(
        cfg1, sac=dataclasses.replace(cfg1.sac, batch_size=16))
    from nlbac_tpu.train.aot import _cache_key

    assert _cache_key(cfg1) != _cache_key(cfg2)
    assert _cache_key(cfg1) == _cache_key(_tiny_cfg())
    # run-section fields (seed/max_episodes/output naming) drive only
    # the host loop and must NOT key the cache
    cfg3 = dataclasses.replace(
        cfg1, run=dataclasses.replace(cfg1.run, seed=99,
                                      max_episodes=123))
    assert _cache_key(cfg1) == _cache_key(cfg3)
