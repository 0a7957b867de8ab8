"""AOT episode-program cache: skip re-tracing + re-lowering on restart.

The fused episode program (train/driver.py) compiles through the axon
REMOTE compiler; the XLA executable is covered by jax's persistent
compilation cache, but the jaxpr->MLIR lowering happens again in every
fresh process and — through the tunneled backend — takes anywhere from
~5s to ~300s for the same program (measured; the variance is tunnel
round-trip latency, not host compute).  ``jax.export`` serializes the
lowered StableHLO module, so later processes deserialize (~0.03s) and
jit the call wrapper (persistent-cache hit ~1s) instead of re-lowering.

Measured end-to-end (unicycle, one v5e): fresh-process start-to-first-
episode went from 60-320s (lowering variance) to ~27s total; steady-
state episode throughput is unchanged (~2000+ steps/s).

The reference has no analog (PyTorch eager re-executes per call); this
replaces the capability cost of torchdiffeq+CUDA warmup with a cached
XLA artifact.

Fail-open: any export/deserialize error falls back to the plain
``jax.jit(make_episode_runner(cfg))`` path.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Callable, Sequence

import jax

_DEFAULT_CACHE_DIR = "/tmp/jax_cache_nlbac/aot"
_registered = False


def register_export_types() -> None:
    """Register every custom pytree node crossing the episode-program
    boundary with jax.export's stable serialization (idempotent)."""
    global _registered
    if _registered:
        return
    from jax import export as jexport
    import optax

    from nlbac_tpu.agent.state import TrainState
    from nlbac_tpu.constraints import LagrangianState
    from nlbac_tpu.replay.buffer import Replay
    from nlbac_tpu.train.driver import EpisodeMetrics
    from nlbac_tpu.train.supervisor import SupervisorState

    for t in (TrainState, LagrangianState, EpisodeMetrics, SupervisorState,
              optax._src.transform.ScaleByAdamState,
              optax._src.base.EmptyState):
        try:
            jexport.register_namedtuple_serialization(
                t, serialized_name=f"nlbac.{t.__module__}.{t.__name__}")
        except ValueError:
            pass  # already registered (idempotence across calls)

    def _ser_layout(layout) -> bytes:
        return json.dumps(layout).encode()

    def _des_layout(b) -> tuple:
        return tuple((n, o, w) for n, o, w in json.loads(bytes(b).decode()))

    try:
        jexport.register_pytree_node_serialization(
            Replay, serialized_name="nlbac.replay.Replay",
            serialize_auxdata=_ser_layout, deserialize_auxdata=_des_layout)
    except ValueError:
        pass
    _registered = True


_code_hash_cache: str | None = None


def _code_hash() -> str:
    """Hash of every .py source in the nlbac_tpu package: a cached
    export must NOT survive a code change (it would silently serve the
    OLD lowered program). ~6k LoC hashes in a few ms; memoized."""
    global _code_hash_cache
    if _code_hash_cache is None:
        import nlbac_tpu

        root = os.path.dirname(os.path.abspath(nlbac_tpu.__file__))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    with open(os.path.join(dirpath, fn), "rb") as f:
                        h.update(fn.encode())
                        h.update(f.read())
        _code_hash_cache = h.hexdigest()[:16]
    return _code_hash_cache


def _extension_hash(cfg) -> str | None:
    """Source hash of RUNTIME-REGISTERED env/constraint objects traced
    into the program. In-package modules are already covered by
    :func:`_code_hash`; a third-party object installed via
    ``register_env`` / ``register_builder`` (examples/custom_env.py)
    must contribute its own source to the key, or an edited extension
    would silently be served the OLD lowered program. Returns None
    when a registered object's source cannot be read (REPL-defined
    class, exec'd code) — the caller must then SKIP the cache
    entirely (plain jit) rather than risk staleness."""
    import inspect

    import nlbac_tpu
    from nlbac_tpu.constraints import get_builder
    from nlbac_tpu.envs import get_env

    pkg_root = os.path.dirname(os.path.abspath(nlbac_tpu.__file__))
    h = hashlib.sha256()
    external = False
    for obj in (get_env(cfg.env.name), get_builder(cfg.constraint.kind)):
        try:
            src_file = os.path.abspath(inspect.getfile(obj))
        except (TypeError, OSError):
            return None
        if src_file.startswith(pkg_root + os.sep):
            continue  # builtin: covered by _code_hash
        external = True
        try:
            h.update(src_file.encode())
            h.update(inspect.getsource(obj).encode())
        except (OSError, TypeError):
            return None
    return h.hexdigest()[:16] if external else ""


def _cache_key(cfg, ext_hash: str = "") -> str:
    dev = jax.devices()[0]
    cfg_dict = dict(cfg.to_dict())
    # the run section (seed, max_episodes, output naming, wandb) only
    # drives the HOST loop — it never reaches the traced program, so it
    # must not key the cache (a --max_episodes change would force a
    # spurious re-export)
    cfg_dict.pop("run", None)
    ident = json.dumps(
        {"cfg": cfg_dict, "jax": jax.__version__,
         "backend": jax.default_backend(),
         "device": getattr(dev, "device_kind", str(dev)),
         "code": _code_hash(), "ext": ext_hash},
        sort_keys=True, default=str)
    return hashlib.sha256(ident.encode()).hexdigest()[:24]


def cached_episode_runner(cfg, example_args: Sequence[Any],
                          cache_dir: str | None = None,
                          env_override=None) -> Callable:
    """Return a jitted episode runner, loading the serialized lowered
    module from the AOT cache when available (and writing it on miss).

    ``example_args`` must carry the exact avals the driver calls with:
    ``(ts, rl_replay, node_replay, key, i_episode, total_steps)``.
    Falls back to the plain jit path on any export machinery error."""
    from nlbac_tpu.train.driver import make_episode_runner

    plain = lambda: jax.jit(make_episode_runner(cfg,
                                                env_override=env_override))
    if env_override is not None:
        # host-env programs contain io_callbacks whose host side can't be
        # serialized into the module portably; keep the plain path
        return plain()
    try:
        from jax import export as jexport

        ext_hash = _extension_hash(cfg)
        if ext_hash is None:
            # a runtime-registered env/builder whose source we cannot
            # hash: caching would risk serving a stale program after an
            # extension edit — plain jit is the only safe path
            return plain()
        register_export_types()
        cache_dir = cache_dir or _DEFAULT_CACHE_DIR
        path = os.path.join(
            cache_dir, f"episode-{_cache_key(cfg, ext_hash)}.jaxexport")
        if os.path.exists(path):
            with open(path, "rb") as f:
                exported = jexport.deserialize(f.read())
            return jax.jit(exported.call)
        exported = jexport.export(plain())(*example_args)
        blob = exported.serialize()
        os.makedirs(cache_dir, exist_ok=True)
        # pid-unique scratch name: two same-config processes missing
        # the cache together (the standard multi-process seed-sweep
        # pattern) must not truncate each other's in-progress write —
        # os.replace then publishes whichever complete blob lands last
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return jax.jit(exported.call)
    except Exception as e:  # noqa: BLE001 — fail-open to the plain path
        import warnings

        warnings.warn(f"AOT episode cache unavailable ({e!r}); "
                      "falling back to plain jit")
        return plain()
