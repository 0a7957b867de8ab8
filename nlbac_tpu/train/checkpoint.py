"""Full-train-state checkpointing.

The reference saves only network state_dicts (actor/critic/lyapunov/
node_model[/barrier] .pkl, UNI/sac_cbf_clf/sac_cbf_clf.py:322-339) and
loses optimizer, replay, multiplier, and RNG state — there is NO true
resume (SURVEY.md §5).  Here the ENTIRE training state — params, opt
states, lambda/rho, both replay buffers, the PRNG key, and step counters —
is saved atomically so a resumed run continues bit-for-bit.

Format: one ``.npz`` archive of flattened pytree LEAVES (named
``<section>.<index>``) plus a JSON manifest of per-leaf shapes/dtypes.
The tree STRUCTURE is never serialized: restore flattens the caller's
config-built templates and unflattens the loaded leaves with the
template treedef, validating shapes/dtypes leaf-by-leaf.  This is
version-sturdy (no class imports) and safe to load from untrusted paths
(numpy arrays only; ``np.load(..., allow_pickle=False)``).  Legacy
round-1 pickle checkpoints are still readable (sniffed by magic bytes) —
only load those from paths you trust.

``save_model_weights`` additionally writes the reference-shaped
weights-only checkpoint for users who only want the policy.
"""

from __future__ import annotations

import io
import json
import os
import pickle
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_host(tree):
    # pipeline the D2H copies: a bare per-leaf np.asarray pays the axon
    # tunnel round-trip latency (~1s/leaf) serially — ~50s per
    # save_model_weights call before this
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    return jax.tree.map(np.asarray, tree)


_SECTIONS = ("train_state", "rl_replay", "node_replay")


def save_checkpoint(path: str, ts, rl_replay, node_replay, key,
                    total_steps, i_episode, extra: Dict[str, Any] | None
                    = None) -> None:
    trees = {"train_state": ts, "rl_replay": rl_replay,
             "node_replay": node_replay}
    arrays: Dict[str, np.ndarray] = {}
    manifest: Dict[str, Any] = {"format": 2, "sections": {}}
    for name in _SECTIONS:
        leaves = jax.tree.leaves(_to_host(trees[name]))
        manifest["sections"][name] = [
            {"shape": list(a.shape), "dtype": str(a.dtype)} for a in leaves]
        for i, a in enumerate(leaves):
            arrays[f"{name}.{i}"] = a
    arrays["key"] = np.asarray(key)
    arrays["counters"] = np.array([int(total_steps), int(i_episode)],
                                  np.int64)
    manifest["extra"] = extra or {}
    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


class AsyncCheckpointer:
    """Async device-to-host snapshots (SURVEY §5): start the D2H copies
    on the caller's thread (cheap, overlapped by the runtime), then
    serialize + atomically write the npz on a background thread so the
    training loop never blocks on the archive write.

    At most one write is in flight; a new ``save`` waits for the previous
    one first (checkpoints are ordered). ``wait()`` joins the last write
    (call it before process exit / reading the file)."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None

    def save(self, path: str, ts, rl_replay, node_replay, key,
             total_steps, i_episode,
             extra: Dict[str, Any] | None = None) -> None:
        self.wait()
        # snapshot to host now (values must not see later updates).
        # Kick off ALL D2H copies first, then materialize: a bare
        # per-leaf np.asarray pays the tunnel round-trip latency
        # serially (~6.7s/snapshot on axon; pipelined ~1.9s).
        trees = (ts, rl_replay, node_replay)
        for tree in trees:
            for leaf in jax.tree.leaves(tree):
                if hasattr(leaf, "copy_to_host_async"):
                    leaf.copy_to_host_async()
        args = (*(jax.tree.map(np.asarray, t) for t in trees),
                np.asarray(key), int(total_steps), int(i_episode))

        def write():
            try:
                save_checkpoint(path, *args, extra=extra)
            except BaseException as e:  # noqa: BLE001 — surfaced in wait()
                self._error = e

        self._error = None
        self._thread = threading.Thread(target=write, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Join the in-flight write and RE-RAISE its failure: a
        swallowed ENOSPC/permission error would let the run 'complete
        successfully' with a stale or missing checkpoint.npz,
        discovered only when a later --resume fails."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
            err = getattr(self, "_error", None)
            if err is not None:
                self._error = None
                raise RuntimeError(
                    f"background checkpoint write failed: {err!r}"
                ) from err


def load_npz_section(z, manifest, name, template):
    """Load + validate one named section of an open checkpoint npz
    against a config-built template tree (leaf count, per-leaf
    shape/dtype).  Shared by the fused-mode restore below and the
    host-loop restore (train/host_loop.restore_host_checkpoint), so a
    format change cannot silently diverge the two."""
    specs = manifest["sections"][name]
    leaves = [z[f"{name}.{i}"] for i in range(len(specs))]
    t_leaves, treedef = jax.tree.flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint {name} has {len(leaves)} leaves but the "
            f"current config expects {len(t_leaves)} — structure "
            "mismatch (was the config changed since saving?)")
    for i, (got, want) in enumerate(zip(leaves, t_leaves)):
        want_shape = tuple(np.shape(want))
        # read dtype from metadata — np.asarray(want) on a jax
        # template leaf forces a D2H transfer (~1s EACH through
        # the axon tunnel; 225 leaves made resume take ~228s)
        want_dtype = np.dtype(getattr(want, "dtype", None)
                              or np.asarray(want).dtype)
        if (tuple(got.shape) != want_shape
                or got.dtype != want_dtype):
            raise ValueError(
                f"checkpoint {name} leaf {i}: {got.shape}/"
                f"{got.dtype} != expected {want_shape}/"
                f"{want_dtype} — shape mismatch (was the config "
                "changed since saving?)")
    return jax.tree.unflatten(treedef, leaves)


def _restore_npz(path, templates):
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(bytes(z["manifest"]).decode())
        out = {name: load_npz_section(z, manifest, name, templates[name])
               for name in _SECTIONS}
        counters = z["counters"]
        key = z["key"].copy()
    # one batched H2D transfer: numpy leaves would otherwise reach the
    # episode jit as host-placed inputs (distinct compile-cache key from
    # the fresh-run device-placed inputs -> spurious ~minutes recompile
    # through the axon remote compiler)
    out, key = jax.device_put((out, key))
    return (out["train_state"], out["rl_replay"], out["node_replay"],
            key, int(counters[0]), int(counters[1]),
            manifest.get("extra", {}))


def _restore_pickle(path, templates):
    """Legacy round-1 format. Pickle executes code on load — trusted
    paths only."""
    with open(path, "rb") as f:
        state = pickle.load(f)
    for name in _SECTIONS:
        saved_td = jax.tree.structure(state[name])
        want_td = jax.tree.structure(templates[name])
        if saved_td != want_td:
            raise ValueError(
                f"checkpoint {name} structure mismatch: was the config "
                f"changed since saving? ({saved_td} != {want_td})")
    restored = jax.device_put((state["train_state"], state["rl_replay"],
                               state["node_replay"], state["key"]))
    return (*restored, state["total_steps"], state["i_episode"],
            state["extra"])


def restore_checkpoint(path: str, ts_template, rl_template, node_template,
                       key_template) -> Tuple[Any, Any, Any, Any, int, int,
                                              Dict[str, Any]]:
    """Restore a checkpoint; the templates supply the tree structure and
    validate that the saved arrays match the current config."""
    del key_template
    templates = {"train_state": ts_template, "rl_replay": rl_template,
                 "node_replay": node_template}
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"PK":  # npz = zip archive
        return _restore_npz(path, templates)
    return _restore_pickle(path, templates)


def save_model_weights(output_dir: str, ts, include_barrier: bool = False
                       ) -> None:
    """Weights-only checkpoint in the reference's file layout
    (actor/critic/lyapunov/node_model[/barrier] .pkl)."""
    from nlbac_tpu.nn import twin_q_unstack

    os.makedirs(output_dir, exist_ok=True)
    files = {
        "actor.pkl": ts.policy,
        # always export the reference's {'q1','q2'} layout, independent
        # of the experimental stacked in-memory layout
        # (nlbac_tpu.experimental.stack_twin_q_state)
        "critic.pkl": twin_q_unstack(ts.critic),
        "lyapunov.pkl": ts.lyap,
        "node_model.pkl": ts.node,
    }
    if include_barrier:
        files["barrier.pkl"] = ts.barrier
    for name, tree in files.items():
        # atomic like save_checkpoint's npz path: --save_best rewrites
        # these on every new best window, and a mid-dump kill must not
        # destroy the previous good snapshot
        dst = os.path.join(output_dir, name)
        tmp = f"{dst}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(_to_host(tree), f)
        os.replace(tmp, dst)


def load_model_weights(output_dir: str, ts, include_barrier: bool = False):
    """Restore weights-only files into a TrainState (load_weights parity,
    UNI/sac_cbf_clf/sac_cbf_clf.py:342-362)."""
    from nlbac_tpu.nn import twin_q_stack

    def _load(name):
        with open(os.path.join(output_dir, name), "rb") as f:
            return pickle.load(f)

    critic = _load("critic.pkl")  # files are always {'q1','q2'} layout
    if "q1" not in ts.critic:  # in-memory layout is stacked
        critic = twin_q_stack(critic)
    ts = ts._replace(policy=_load("actor.pkl"), critic=critic,
                     lyap=_load("lyapunov.pkl"),
                     node=_load("node_model.pkl"))
    if include_barrier and os.path.exists(
            os.path.join(output_dir, "barrier.pkl")):
        ts = ts._replace(barrier=_load("barrier.pkl"))
    return ts
