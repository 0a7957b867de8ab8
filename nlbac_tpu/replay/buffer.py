"""On-device replay ring buffer.

Replaces the reference's host-side list-of-tuples + stdlib
``random.sample`` (UNI/sac_cbf_clf/replay_memory.py:4-28) with a
preallocated pytree of device arrays, an integer write cursor, and
``jax.random`` sampling — so pushes and samples live inside the jitted
training step with zero host transfers.

Record fields mirror the reference's 10-field records (11 with the NBC
barrier signal): obs, action, reward, constraint, lyap_t, lyap_t1,
barrier_signal, next_obs, mask, t, next_t
(UNI/main.py:96-104, NBC-UNI/sac_cbf_clf/replay_memory.py:12).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Replay(NamedTuple):
    """Ring buffer state. ``data`` is a dict of (capacity, ...) arrays."""

    data: dict
    position: jnp.ndarray  # i32, next write slot (= total pushes mod cap)
    size: jnp.ndarray  # i32, number of valid records
    total: jnp.ndarray  # i64-ish i32, total pushes ever (reference's
    # ``position`` counter used for the NODE batch bound,
    # UNI/sac_cbf_clf/sac_cbf_clf.py:206)


def create(capacity: int, obs_dim: int, action_dim: int,
           lyap_dim: int) -> Replay:
    f = jnp.float32
    data = {
        "obs": jnp.zeros((capacity, obs_dim), f),
        "action": jnp.zeros((capacity, action_dim), f),
        "reward": jnp.zeros((capacity,), f),
        "constraint": jnp.zeros((capacity,), f),
        "lyap_t": jnp.zeros((capacity, lyap_dim), f),
        "lyap_t1": jnp.zeros((capacity, lyap_dim), f),
        "barrier_signal": jnp.zeros((capacity,), f),
        "next_obs": jnp.zeros((capacity, obs_dim), f),
        "mask": jnp.zeros((capacity,), f),
        "t": jnp.zeros((capacity,), f),
        "next_t": jnp.zeros((capacity,), f),
    }
    return Replay(data=data, position=jnp.int32(0), size=jnp.int32(0),
                  total=jnp.int32(0))


def push(replay: Replay, record: dict, do_push=True) -> Replay:
    """Write one record at the cursor; ``do_push`` masks the write (the
    reference skips the RL buffer while the backup controller is active,
    UNI/main.py:96-99)."""
    pos = replay.position
    do = jnp.asarray(do_push)

    def write(arr, val):
        val = jnp.asarray(val, arr.dtype)
        new = jax.lax.dynamic_update_index_in_dim(arr, val, pos, axis=0)
        return jax.lax.select(do, new, arr)

    data = {k: write(replay.data[k], record[k]) for k in replay.data}
    capacity = replay.data["reward"].shape[0]
    inc = do.astype(jnp.int32)
    new_pos = (pos + inc) % capacity
    new_size = jnp.minimum(replay.size + inc, capacity)
    return Replay(data=data, position=new_pos, size=new_size,
                  total=replay.total + inc)


def sample(replay: Replay, key, batch_size: int,
           max_index: jnp.ndarray | None = None) -> dict:
    """Uniform sample of ``batch_size`` records (with replacement).

    ``max_index`` optionally bounds sampling to the first N records — the
    device-shape-static analog of the reference's dynamic
    ``min(position, 32768)`` NODE batch (UNI/sac_cbf_clf/sac_cbf_clf.py:206):
    we always gather a static-shaped batch but draw indices from
    [0, min(size, max_index)).
    """
    hi = replay.size if max_index is None else jnp.minimum(replay.size,
                                                           max_index)
    hi = jnp.maximum(hi, 1)
    idx = jax.random.randint(key, (batch_size,), 0, hi)
    return {k: v[idx] for k, v in replay.data.items()}


def record_from_step(obs, action, out, mask, t, next_t) -> dict:
    """Build a replay record from a StepOut transition."""
    return {
        "obs": obs, "action": action, "reward": out.reward,
        "constraint": out.constraint, "lyap_t": out.lyap_t,
        "lyap_t1": out.lyap_t1, "barrier_signal": out.barrier_signal,
        "next_obs": out.obs, "mask": mask, "t": t, "next_t": next_t,
    }
