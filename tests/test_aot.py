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


def test_aot_extension_hash_keys_registered_modules(tmp_path):
    """Runtime-registered env/builder source must key the AOT cache:
    builtin presets hash to the empty sentinel (covered by _code_hash),
    an external module contributes its source (an edit changes the
    key), and an unhashable object (no readable source) returns None so
    the caller skips the cache entirely."""
    import sys
    import textwrap

    import nlbac_tpu.constraints as cmod
    import nlbac_tpu.envs as emod
    from nlbac_tpu.train.aot import _cache_key, _extension_hash

    cfg = _tiny_cfg()
    assert _extension_hash(cfg) == ""  # builtin preset

    # an external env module on disk: source contributes to the key
    mod_path = tmp_path / "ext_env_mod.py"
    src = textwrap.dedent("""
        from nlbac_tpu.envs import unicycle as _u
        SPEC = _u.SPEC
        reset = _u.reset
        step = _u.step
        obs_to_state = _u.obs_to_state
        state_to_obs = _u.state_to_obs
    """)
    mod_path.write_text(src)
    sys.path.insert(0, str(tmp_path))
    try:
        import ext_env_mod

        emod._ENVS["ext_env_test"] = ext_env_mod
        cfg_ext = dataclasses.replace(
            cfg, env=dataclasses.replace(cfg.env, name="ext_env_test"))
        h1 = _extension_hash(cfg_ext)
        assert h1 and h1 != ""
        assert _cache_key(cfg_ext, h1) != _cache_key(cfg, "")

        # edit the module source -> different hash (stale-cache guard)
        mod_path.write_text(src + "\n# edited\nX = 1\n")
        import importlib

        importlib.reload(ext_env_mod)
        emod._ENVS["ext_env_test"] = ext_env_mod
        h2 = _extension_hash(cfg_ext)
        assert h2 != h1

        # an object with unreadable source -> None (skip the cache)
        class NoSource:
            SPEC = ext_env_mod.SPEC
            reset = staticmethod(ext_env_mod.reset)
            step = staticmethod(ext_env_mod.step)
            obs_to_state = staticmethod(ext_env_mod.obs_to_state)
            state_to_obs = staticmethod(ext_env_mod.state_to_obs)

        NoSource.__module__ = "__nonexistent__"
        emod._ENVS["ext_env_test"] = NoSource
        assert _extension_hash(cfg_ext) is None
    finally:
        sys.path.remove(str(tmp_path))
        emod._ENVS.pop("ext_env_test", None)
        cmod._BUILDERS.pop("ext_env_test", None)
