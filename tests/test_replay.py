"""Replay ring-buffer tests: masked pushes, wraparound, bounded sampling,
PRNG determinism — all under jit."""

import jax
import jax.numpy as jnp
import numpy as np

from nlbac_tpu import replay


def _mk(capacity=8):
    return replay.create(capacity, obs_dim=3, action_dim=2, lyap_dim=2)


def _rec(i):
    f = jnp.float32
    return {
        "obs": jnp.full((3,), f(i)), "action": jnp.full((2,), f(i)),
        "reward": f(i), "constraint": f(i),
        "lyap_t": jnp.full((2,), f(i)), "lyap_t1": jnp.full((2,), f(i)),
        "barrier_signal": f(0), "next_obs": jnp.full((3,), f(i + 1)),
        "mask": f(1), "t": f(i), "next_t": f(i + 1),
    }


def test_push_and_size():
    buf = _mk()
    for i in range(5):
        buf = jax.jit(replay.push)(buf, _rec(i))
    assert int(buf.size) == 5 and int(buf.position) == 5
    np.testing.assert_allclose(np.asarray(buf.field("reward")[:5]),
                               np.arange(5))


def test_wraparound_overwrites_oldest():
    buf = _mk(capacity=4)
    for i in range(6):
        buf = replay.push(buf, _rec(i))
    assert int(buf.size) == 4
    assert int(buf.position) == 2
    assert int(buf.total) == 6
    np.testing.assert_allclose(np.asarray(buf.field("reward")),
                               [4, 5, 2, 3])


def test_masked_push_is_noop():
    buf = _mk()
    buf = replay.push(buf, _rec(7), do_push=jnp.array(False))
    assert int(buf.size) == 0 and int(buf.total) == 0
    np.testing.assert_allclose(np.asarray(buf.field("reward")), 0.0)


def test_sample_within_size_and_deterministic():
    buf = _mk(capacity=16)
    for i in range(10):
        buf = replay.push(buf, _rec(i))
    key = jax.random.PRNGKey(0)
    b1 = jax.jit(lambda b, k: replay.sample(b, k, 32))(buf, key)
    b2 = replay.sample(buf, key, 32)
    np.testing.assert_allclose(np.asarray(b1["reward"]),
                               np.asarray(b2["reward"]))
    assert b1["obs"].shape == (32, 3)
    assert np.all(np.asarray(b1["reward"]) < 10)


def test_sample_bounded_max_index():
    """Optional prefix-window sampling (NOT used by the agent's NODE
    path, which samples the whole buffer — reference parity)."""
    buf = _mk(capacity=64)
    for i in range(50):
        buf = replay.push(buf, _rec(i))
    b = replay.sample(buf, jax.random.PRNGKey(1), 128,
                      max_index=jnp.int32(5))
    assert np.all(np.asarray(b["reward"]) < 5)


def test_empty_buffer_sample_does_not_crash():
    buf = _mk()
    b = replay.sample(buf, jax.random.PRNGKey(2), 4)
    assert b["obs"].shape == (4, 3)
