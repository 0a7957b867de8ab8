"""On-device replay ring buffer.

Replaces the reference's host-side list-of-tuples + stdlib
``random.sample`` (UNI/sac_cbf_clf/replay_memory.py:4-28) with ONE
preallocated (capacity, record_width) device array, an integer write
cursor, and ``jax.random`` sampling — so pushes and samples live inside
the jitted training step with zero host transfers.

Record fields mirror the reference's 10-field records (11 with the NBC
barrier signal): obs, action, reward, constraint, lyap_t, lyap_t1,
barrier_signal, next_obs, mask, t, next_t
(UNI/main.py:96-104, NBC-UNI/sac_cbf_clf/replay_memory.py:12).

Perf note: fields are PACKED into one row per record, so a push is a
single dynamic-update-slice and a sample is a single row gather — the
episode loop executes 2 memory ops per step for its two buffers instead
of 22 (the while-loop body is latency-bound on op count).  The field
layout is static pytree aux data; ``sample`` returns an unpacked dict of
views.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

FIELD_ORDER = ("obs", "action", "reward", "constraint", "lyap_t",
               "lyap_t1", "barrier_signal", "next_obs", "mask", "t",
               "next_t")
# conceptually scalar fields come back squeezed to (...,); vector fields
# (obs/action/lyap) keep their trailing dim even at width 1 (cars action)
SCALAR_FIELDS = frozenset(("reward", "constraint", "barrier_signal",
                           "mask", "t", "next_t"))


def _field_widths(obs_dim: int, action_dim: int, lyap_dim: int) -> dict:
    return {
        "obs": obs_dim, "action": action_dim, "reward": 1,
        "constraint": 1, "lyap_t": lyap_dim, "lyap_t1": lyap_dim,
        "barrier_signal": 1, "next_obs": obs_dim, "mask": 1, "t": 1,
        "next_t": 1,
    }


def make_layout(obs_dim: int, action_dim: int, lyap_dim: int
                ) -> Tuple[Tuple[str, int, int], ...]:
    """Static (name, offset, width) triples for the packed row."""
    widths = _field_widths(obs_dim, action_dim, lyap_dim)
    layout = []
    off = 0
    for name in FIELD_ORDER:
        w = widths[name]
        layout.append((name, off, w))
        off += w
    return tuple(layout)


@jax.tree_util.register_pytree_node_class
class Replay:
    """Packed ring buffer. ``layout`` is static pytree aux data."""

    def __init__(self, data, position, size, total, layout):
        self.data = data  # (capacity, record_width) f32
        self.position = position  # i32, next write slot
        self.size = size  # i32, valid records
        self.total = total  # i32, pushes ever (reference's ``position``
        # counter used for the NODE batch bound, sac_cbf_clf.py:206)
        self.layout = layout

    def tree_flatten(self):
        return ((self.data, self.position, self.size, self.total),
                self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, layout=aux)

    # convenience accessors (host/test use)
    def field(self, name):
        for n, off, w in self.layout:
            if n == name:
                col = self.data[:, off:off + w]
                return col[:, 0] if name in SCALAR_FIELDS else col
        raise KeyError(name)

    def with_field(self, name, value):
        for n, off, w in self.layout:
            if n == name:
                value = jnp.asarray(value, jnp.float32)
                if w == 1 and value.ndim == 1:
                    value = value[:, None]
                return Replay(self.data.at[:, off:off + w].set(value),
                              self.position, self.size, self.total,
                              self.layout)
        raise KeyError(name)

    def __repr__(self):
        return (f"Replay(capacity={self.data.shape[0]}, "
                f"width={self.data.shape[1]}, size={self.size})")


def create(capacity: int, obs_dim: int, action_dim: int,
           lyap_dim: int) -> Replay:
    layout = make_layout(obs_dim, action_dim, lyap_dim)
    width = sum(w for _, _, w in layout)
    return Replay(data=jnp.zeros((capacity, width), jnp.float32),
                  position=jnp.int32(0), size=jnp.int32(0),
                  total=jnp.int32(0), layout=layout)


def _pack(layout, record: dict) -> jnp.ndarray:
    parts = []
    for name, _, w in layout:
        v = jnp.asarray(record[name], jnp.float32)
        parts.append(v.reshape(w))
    return jnp.concatenate(parts)


def unpack_rows(layout, rows: jnp.ndarray) -> dict:
    """Unpack packed rows (..., record_width) into a field dict — the
    public form of the sample() post-processing, for callers that gather
    rows themselves (e.g. the driver's fused multi-update gather)."""
    return _unpack(layout, rows)


def _unpack(layout, rows: jnp.ndarray) -> dict:
    out = {}
    for name, off, w in layout:
        col = rows[..., off:off + w]
        out[name] = col[..., 0] if name in SCALAR_FIELDS else col
    return out


def push(replay: Replay, record: dict, do_push=True) -> Replay:
    """Write one record at the cursor; ``do_push`` masks the write (the
    reference skips the RL buffer while the backup controller is active,
    UNI/main.py:96-99)."""
    do = jnp.asarray(do_push)
    row = _pack(replay.layout, record)
    new = jax.lax.dynamic_update_index_in_dim(replay.data, row,
                                              replay.position, axis=0)
    data = jax.lax.select(do, new, replay.data)
    capacity = replay.data.shape[0]
    inc = do.astype(jnp.int32)
    return Replay(data=data,
                  position=(replay.position + inc) % capacity,
                  size=jnp.minimum(replay.size + inc, capacity),
                  total=replay.total + inc, layout=replay.layout)


def sample(replay: Replay, key, batch_size: int,
           max_index=None) -> dict:
    """Uniform sample of ``batch_size`` records (with replacement) from
    the whole valid range [0, size).

    This is the static-shape analog of the reference's NODE sampling —
    batch size ``min(position, 32768)`` drawn from the ENTIRE buffer
    (UNI/sac_cbf_clf/sac_cbf_clf.py:205-208, replay_memory.py:23): the
    bound lives on the batch SIZE (here static = ``batch_size``), never
    on the index range.  ``max_index`` optionally restricts indices to
    the first N records for callers that genuinely want a prefix window;
    the agent's training paths do not use it.
    """
    hi = replay.size if max_index is None else jnp.minimum(replay.size,
                                                           max_index)
    hi = jnp.maximum(hi, 1)
    idx = jax.random.randint(key, (batch_size,), 0, hi)
    return _unpack(replay.layout, replay.data[idx])


def record_from_step(obs, action, out, mask, t, next_t) -> dict:
    """Build a replay record from a StepOut transition."""
    return {
        "obs": obs, "action": action, "reward": out.reward,
        "constraint": out.constraint, "lyap_t": out.lyap_t,
        "lyap_t1": out.lyap_t1, "barrier_signal": out.barrier_signal,
        "next_obs": out.obs, "mask": mask, "t": t, "next_t": next_t,
    }
