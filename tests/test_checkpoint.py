"""Checkpoint/resume tests: full-state roundtrip (true resume — the
capability the reference lacks, SURVEY.md §5) and the reference-layout
weights-only files."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from nlbac_tpu.agent import create_train_state
from nlbac_tpu.config import ReplayConfig, get_config
from nlbac_tpu.train.checkpoint import (load_model_weights,
                                        restore_checkpoint,
                                        save_checkpoint,
                                        save_model_weights)
from nlbac_tpu.train.driver import create_replays, make_episode_runner


def tiny_cfg():
    cfg = get_config("unicycle")
    return dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, max_episode_steps=15),
        sac=dataclasses.replace(cfg.sac, hidden_dim=16, batch_size=4,
                                updates_per_step=1, start_steps=5),
        node=dataclasses.replace(cfg.node, hidden_dim=8, f_hidden_layers=1,
                                 g_hidden_layers=1, max_batch=8,
                                 update_interval=2),
        replay=ReplayConfig(capacity=128, node_capacity=128),
    )


def _trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_full_state_roundtrip_resume(tmp_path):
    cfg = tiny_cfg()
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg)
    run = jax.jit(make_episode_runner(cfg))

    key = jax.random.PRNGKey(1)
    ts, rl, node, m, total = run(ts, rl, node, key, jnp.int32(0),
                                 jnp.int32(0))
    path = os.path.join(tmp_path, "ckpt.pkl")
    save_checkpoint(path, ts, rl, node, key, total, 0,
                    extra={"note": "test"})

    ts_t = create_train_state(cfg, jax.random.PRNGKey(9))
    rl_t, node_t = create_replays(cfg)
    ts2, rl2, node2, key2, total2, ep2, extra = restore_checkpoint(
        path, ts_t, rl_t, node_t, key)
    assert _trees_equal(ts, ts2)
    assert _trees_equal(rl, rl2)
    assert int(total2) == int(total)
    assert extra["note"] == "test"

    # resume: continuing from the restored state matches continuing from
    # the live state bit-for-bit
    k = jax.random.PRNGKey(2)
    outs_a = run(ts, rl, node, k, jnp.int32(1), total)
    outs_b = run(jax.tree.map(jnp.asarray, ts2),
                 jax.tree.map(jnp.asarray, rl2),
                 jax.tree.map(jnp.asarray, node2), k, jnp.int32(1),
                 jnp.int32(total2))
    np.testing.assert_allclose(float(outs_a[3].reward),
                               float(outs_b[3].reward))
    assert _trees_equal(outs_a[0].policy, outs_b[0].policy)


def test_structure_mismatch_detected(tmp_path):
    cfg = tiny_cfg()
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg)
    path = os.path.join(tmp_path, "ckpt.pkl")
    save_checkpoint(path, ts, rl, node, jax.random.PRNGKey(0), 0, 0)

    cfg2 = dataclasses.replace(
        cfg, replay=ReplayConfig(capacity=64, node_capacity=64))
    rl2, node2 = create_replays(cfg2)
    try:
        restore_checkpoint(path, ts, rl2, node2, jax.random.PRNGKey(0))
    except ValueError as e:
        assert "mismatch" in str(e) or "structure" in str(e)
    else:
        # capacity changes alter array shapes, not structure; shape
        # mismatches surface on first use instead. Structure checks fire
        # for config changes that alter the tree (e.g. another NODE form).
        pass


def test_weights_only_reference_layout(tmp_path):
    cfg = tiny_cfg()
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    save_model_weights(str(tmp_path), ts, include_barrier=True)
    for f in ("actor.pkl", "critic.pkl", "lyapunov.pkl", "node_model.pkl",
              "barrier.pkl"):
        assert os.path.exists(os.path.join(tmp_path, f)), f

    ts2 = create_train_state(cfg, jax.random.PRNGKey(42))
    ts2 = load_model_weights(str(tmp_path), ts2, include_barrier=True)
    assert _trees_equal(ts.policy, ts2.policy)
    assert _trees_equal(ts.node, ts2.node)
    # untouched parts stay from the new init
    assert not _trees_equal(ts.backup_policy, ts2.backup_policy)


def test_npz_format_and_legacy_pickle_both_restore(tmp_path):
    """Native checkpoints are npz (arrays only, allow_pickle=False);
    legacy round-1 pickle files are sniffed by magic and still load."""
    import pickle
    import zipfile

    cfg = tiny_cfg()
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg)
    key = jax.random.PRNGKey(7)

    npz_path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(npz_path, ts, rl, node, key, 5, 2, extra={"a": 1})
    assert zipfile.is_zipfile(npz_path)  # npz = zip, no pickle inside

    # hand-write the legacy pickle layout
    pkl_path = os.path.join(tmp_path, "ckpt_legacy.pkl")
    host = lambda t: jax.tree.map(np.asarray, t)
    with open(pkl_path, "wb") as f:
        pickle.dump({"train_state": host(ts), "rl_replay": host(rl),
                     "node_replay": host(node), "key": np.asarray(key),
                     "total_steps": 5, "i_episode": 2,
                     "extra": {"a": 1}}, f)

    for path in (npz_path, pkl_path):
        ts2, rl2, node2, key2, total2, ep2, extra = restore_checkpoint(
            path, ts, rl, node, key)
        assert _trees_equal(ts, ts2), path
        assert _trees_equal(node, node2), path
        assert (int(total2), int(ep2)) == (5, 2)
        assert extra == {"a": 1}


def test_npz_shape_mismatch_detected(tmp_path):
    cfg = tiny_cfg()
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, ts, rl, node, jax.random.PRNGKey(0), 0, 0)

    cfg2 = dataclasses.replace(
        cfg, replay=ReplayConfig(capacity=64, node_capacity=64))
    rl2, node2 = create_replays(cfg2)
    import pytest
    with pytest.raises(ValueError, match="mismatch"):
        restore_checkpoint(path, ts, rl2, node2, jax.random.PRNGKey(0))


def test_async_checkpointer_roundtrip(tmp_path):
    """AsyncCheckpointer writes on a background thread; wait() makes the
    file durable and the content equals a synchronous save."""
    from nlbac_tpu.train.checkpoint import AsyncCheckpointer

    cfg = tiny_cfg()
    ts = create_train_state(cfg, jax.random.PRNGKey(0))
    rl, node = create_replays(cfg)
    key = jax.random.PRNGKey(3)

    w = AsyncCheckpointer()
    path = os.path.join(tmp_path, "async.npz")
    w.save(path, ts, rl, node, key, 9, 4, extra={"k": "v"})
    w.wait()
    ts2, rl2, node2, key2, total2, ep2, extra = restore_checkpoint(
        path, ts, rl, node, key)
    assert _trees_equal(ts, ts2) and _trees_equal(rl, rl2)
    assert (int(total2), int(ep2)) == (9, 4)
    assert extra == {"k": "v"}

    # back-to-back saves serialize (ordered, at most one in flight)
    w.save(path, ts, rl, node, key, 10, 5)
    w.save(path, ts, rl, node, key, 11, 6)
    w.wait()
    *_, total3, ep3, _ = restore_checkpoint(path, ts, rl, node, key)
    assert (int(total3), int(ep3)) == (11, 6)
