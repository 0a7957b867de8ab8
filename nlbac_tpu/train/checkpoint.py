"""Full-train-state checkpointing.

The reference saves only network state_dicts (actor/critic/lyapunov/
node_model[/barrier] .pkl, UNI/sac_cbf_clf/sac_cbf_clf.py:322-339) and
loses optimizer, replay, multiplier, and RNG state — there is NO true
resume (SURVEY.md §5).  Here the ENTIRE training state — params, opt
states, lambda/rho, both replay buffers, the PRNG key, and step counters —
is one pytree moved to host numpy and pickled atomically, so a resumed run
continues bit-for-bit.  (flax msgpack can't encode NamedTuple nodes like
Replay/LagrangianState, so the full-state path uses pickle; the pytree
LEAVES are plain numpy arrays either way.)

``save_model_weights`` additionally writes the reference-shaped
weights-only checkpoint for users who only want the policy.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Tuple

import jax
import numpy as np



def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(path: str, ts, rl_replay, node_replay, key,
                    total_steps, i_episode, extra: Dict[str, Any] | None
                    = None) -> None:
    state = {
        "train_state": _to_host(ts),
        "rl_replay": _to_host(rl_replay),
        "node_replay": _to_host(node_replay),
        "key": np.asarray(key),
        "total_steps": int(total_steps),
        "i_episode": int(i_episode),
        "extra": extra or {},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def restore_checkpoint(path: str, ts_template, rl_template, node_template,
                       key_template) -> Tuple[Any, Any, Any, Any, int, int,
                                              Dict[str, Any]]:
    """Restore a checkpoint; the templates are used only to validate that
    the saved structure matches the current config."""
    with open(path, "rb") as f:
        state = pickle.load(f)
    for name, template in (("train_state", ts_template),
                           ("rl_replay", rl_template),
                           ("node_replay", node_template)):
        saved_td = jax.tree.structure(state[name])
        want_td = jax.tree.structure(template)
        if saved_td != want_td:
            raise ValueError(
                f"checkpoint {name} structure mismatch: was the config "
                f"changed since saving? ({saved_td} != {want_td})")
    del key_template
    return (state["train_state"], state["rl_replay"],
            state["node_replay"], state["key"], state["total_steps"],
            state["i_episode"], state["extra"])


def save_model_weights(output_dir: str, ts, include_barrier: bool = False
                       ) -> None:
    """Weights-only checkpoint in the reference's file layout
    (actor/critic/lyapunov/node_model[/barrier] .pkl)."""
    os.makedirs(output_dir, exist_ok=True)
    files = {
        "actor.pkl": ts.policy,
        "critic.pkl": ts.critic,
        "lyapunov.pkl": ts.lyap,
        "node_model.pkl": ts.node,
    }
    if include_barrier:
        files["barrier.pkl"] = ts.barrier
    for name, tree in files.items():
        with open(os.path.join(output_dir, name), "wb") as f:
            pickle.dump(_to_host(tree), f)


def load_model_weights(output_dir: str, ts, include_barrier: bool = False):
    """Restore weights-only files into a TrainState (load_weights parity,
    UNI/sac_cbf_clf/sac_cbf_clf.py:342-362)."""
    def _load(name):
        with open(os.path.join(output_dir, name), "rb") as f:
            return pickle.load(f)

    ts = ts._replace(policy=_load("actor.pkl"), critic=_load("critic.pkl"),
                     lyap=_load("lyapunov.pkl"),
                     node=_load("node_model.pkl"))
    if include_barrier and os.path.exists(
            os.path.join(output_dir, "barrier.pkl")):
        ts = ts._replace(barrier=_load("barrier.pkl"))
    return ts
