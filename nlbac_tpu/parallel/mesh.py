"""Scale-out over device meshes: the honest TPU successor to the
reference's vendored-but-dead MPI layer (UNI/utils/mpi_tools.py,
mpi_pytorch.py — never invoked by any training path; SURVEY.md §2.3).

Two first-class modes, composable:

- **Seed-parallel** (replaces ``mpi_fork``; CLI ``--n_seeds``): N
  independent training states, one per device (async dispatch — the
  measured fast path) or one per mesh row (lockstep vmap).
- **Data-parallel** (replaces ``mpi_avg_grads``; CLI ``--dp``): the
  update batches INSIDE the fused episode program are sharded over a
  'dp' mesh axis (:func:`make_dp_episode_runner`); GSPMD turns every
  batch-mean reduction into a psum over ICI automatically (gradients
  included), which is exactly mpi_avg_grads without any hand-written
  collective.  A multi-episode dp training run reproduces the
  single-device run to f32 tolerance (dryrun_multichip step 5).
- ``--n_seeds X --dp Y`` composes them: each seed trains dp-sharded on
  its own disjoint group of Y devices (``make_async_seed_runner(dp=)``).
- **Tensor-parallel** (CLI ``--tp``): every network's params — and,
  mirroring their tree structure, the targets and Adam moments — are
  Megatron-sharded over a 'tp' axis (:func:`make_tp_episode_runner`);
  GSPMD inserts the row-parallel all-reduces.  Composes with dp on a
  ('dp', 'tp') mesh and with ``--n_seeds`` (each seed on its own
  dp x tp device group).  A throughput loss at the reference's widths
  (documented in the CLI help); the mode exists so grown models shard
  without code changes, numerics certified == single-device.

Host-side multi-process init (``jax.distributed.initialize``) is wrapped
by :func:`init_distributed` and invoked by the CLI's
``--coordinator/--num_processes/--process_id`` flags; rank-0-gated
logging in train/cli.py mirrors the reference's ``proc_id()==0``
convention.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nlbac_tpu.agent import create_train_state, make_agent
from nlbac_tpu.config import NLBACConfig
from nlbac_tpu.train.driver import create_replays, make_episode_runner


def make_mesh(shape: Sequence[int],
              axis_names: Sequence[str] = ("seed", "dp"),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {tuple(shape)} needs {n} devices, have "
                         f"{len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (no-op for single-process runs)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def proc_id() -> int:
    return jax.process_index()


def is_rank0() -> bool:
    return proc_id() == 0


def statistics_scalar(x, with_min_and_max: bool = False):
    """Mean/std (optionally min/max) of per-seed scalars — the
    mpi_statistics_scalar equivalent (UNI/utils/mpi_tools.py:58-92) over
    the seed axis instead of MPI ranks."""
    x = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(x)
    std = jnp.std(x)
    if with_min_and_max:
        return mean, std, jnp.min(x), jnp.max(x)
    return mean, std


# ---------------------------------------------------------------------------
# Seed-parallel training
# ---------------------------------------------------------------------------

def make_seed_parallel_runner(cfg: NLBACConfig, mesh: Mesh,
                              n_seeds: int, seed_axis: str = "seed"):
    """Build (init_fn, run_fn) for N-seed lockstep training.

    ``init_fn(base_seed) -> (ts, rl, node, keys, total)`` creates N
    everything, sharded over ``seed_axis``; ``run_fn`` advances every seed
    one episode inside a single XLA program (the per-seed while_loops are
    batched into one masked loop by vmap)."""
    run_episode = make_episode_runner(cfg)

    def shard(tree):
        """Shard the leading (seed) axis of every leaf over the mesh."""
        def put(x):
            spec = P(seed_axis, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.tree.map(put, tree)

    def init_fn(base_seed: int):
        keys = jax.random.split(jax.random.PRNGKey(base_seed), n_seeds)
        ts = jax.vmap(lambda k: create_train_state(cfg, k))(keys)
        rl, node = create_replays(cfg)
        stack = lambda t: jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_seeds,) + x.shape), t)
        rl, node = stack(rl), stack(node)
        run_keys = jax.random.split(jax.random.PRNGKey(base_seed + 1),
                                    n_seeds)
        total = jnp.zeros((n_seeds,), jnp.int32)
        return (shard(ts), shard(rl), shard(node), shard(run_keys),
                shard(total))

    @jax.jit
    def run_fn(ts, rl, node, keys, i_episode, total):
        new_keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
        ep_keys = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
        outs = jax.vmap(
            lambda t, r, n, k, tot: run_episode(t, r, n, k, i_episode,
                                                tot))(ts, rl, node,
                                                      ep_keys, total)
        ts, rl, node, metrics, total = outs
        return ts, rl, node, new_keys, metrics, total

    return init_fn, run_fn


def make_async_seed_runner(cfg: NLBACConfig, devices=None,
                           n_seeds: Optional[int] = None, dp: int = 1,
                           tp: int = 1):
    """Fast seed-parallel training: one independent training state PER
    DEVICE, advanced by async dispatch of the PLAIN (unbatched) episode
    program — each chip runs at full single-chip speed.

    This is the high-throughput alternative to the mesh/vmap runner
    above: vmapping the episode over a seed axis turns the replay's
    dynamic-update-slices into scatters and lockstep-masks the
    while_loop (~2.3x slower per seed measured on v5e), and shard_map
    with manual layouts measured far worse. Async dispatch costs only
    ~ms per call and the episodes overlap across devices.

    ``n_seeds`` defaults to one per device; more seeds than devices are
    laid out round-robin (they time-share chips but stay independent —
    the single-chip degenerate mode is how ``--n_seeds`` works in this
    image's 1-chip environment).

    Returns (states, step_fn): ``states`` is a list of per-device
    (ts, rl, node, key, total) tuples; ``step_fn(states, i_episode)``
    advances every seed one episode and returns (states, metrics_list).
    Seed ``i`` uses PRNG seed ``base_seed + i`` with exactly the key
    stream of a single-seed ``train.cli.train`` run, so each row is
    bit-reproducible as a standalone run.

    ``dp > 1`` composes seed- and data-parallelism the fast way: the
    devices are cut into ``len(devices)//dp`` disjoint groups, each seed
    trains on its own group with the dp-sharded episode program
    (:func:`make_dp_episode_runner` — batch psums ride ICI *within* the
    group), and seeds stay independent across groups under async
    dispatch (no lockstep vmap masking).  This is the ``--n_seeds X
    --dp Y`` layout of a (seed, dp) mesh without the measured 2.3x
    lockstep penalty of vmapping the episode.  ``tp > 1`` composes the
    same way with tensor-parallel groups (group size ``dp * tp``,
    :func:`make_tp_episode_runner` per group).
    """
    devices = devices if devices is not None else jax.devices()
    if dp > 1 or tp > 1:
        gsz = dp * tp
        n_groups = len(devices) // gsz
        if n_groups < 1:
            raise ValueError(f"dp={dp} x tp={tp} needs at least {gsz} "
                             f"devices, have {len(devices)}")
        n_seeds = n_groups if n_seeds is None else n_seeds
        # round-robin over i % n_used groups: with n_seeds < n_groups the
        # tail groups are never indexed — don't build their meshes/agents
        n_used = min(n_seeds, n_groups)
        groups = [devices[g * gsz:(g + 1) * gsz] for g in range(n_used)]
        if tp > 1:
            placed = [make_tp_episode_runner(cfg, tp, dp=dp, devices=grp)
                      for grp in groups]
        else:
            placed = [make_dp_episode_runner(cfg, dp, devices=grp)
                      for grp in groups]
        n_groups = n_used

        def init_fn_dp(base_seed: int):
            states = []
            for i in range(n_seeds):
                place, _ = placed[i % n_groups]
                key = jax.random.PRNGKey(base_seed + i)
                key, kinit = jax.random.split(key)
                ts = create_train_state(cfg, kinit)
                rl, node = create_replays(cfg)
                states.append(list(place(
                    (ts, rl, node, key, jnp.int32(0)))))
            return states

        def step_fn_dp(states, i_episode, block=True):
            metrics = []
            for i, st in enumerate(states):
                _, run = placed[i % n_groups]
                ts, rl, node, key, total = st
                key, kep = jax.random.split(key)
                ts, rl, node, m, total = run(ts, rl, node, kep,
                                             jnp.int32(i_episode), total)
                st[0], st[1], st[2], st[3], st[4] = ts, rl, node, key, total
                metrics.append(m)
            if block:
                jax.block_until_ready([m.reward for m in metrics])
            return states, metrics

        return init_fn_dp, step_fn_dp
    n_seeds = len(devices) if n_seeds is None else n_seeds
    # Built lazily on the first step so the AOT lowering cache
    # (train/aot.py) can key off real example avals: on the axon backend
    # the jaxpr->MLIR lowering of the episode program swings 5-300s per
    # process, which the serialized-module cache reduces to ~0.03s — the
    # same win single-seed train() and bench.py already get.
    run_box: list = []

    def _get_run(st):
        if not run_box:
            from nlbac_tpu.train.aot import cached_episode_runner

            example = (st[0], st[1], st[2], st[3], jnp.int32(0), st[4])
            run_box.append(cached_episode_runner(cfg, example))
        return run_box[0]

    def init_fn(base_seed: int):
        states = []
        for i in range(n_seeds):
            dev = devices[i % len(devices)]
            key = jax.random.PRNGKey(base_seed + i)
            key, kinit = jax.random.split(key)
            ts = create_train_state(cfg, kinit)
            rl, node = create_replays(cfg)
            put = lambda t: jax.tree.map(
                lambda x: jax.device_put(x, dev), t)
            states.append([put(ts), put(rl), put(node),
                           jax.device_put(key, dev),
                           jax.device_put(jnp.int32(0), dev)])
        return states

    def step_fn(states, i_episode, block=True):
        """``block=False`` returns right after dispatch (async futures in
        ``metrics``) — callers that overlap the previous episode's host
        fetch with this episode's device compute use it (the pipelined
        --n_seeds loop; measured win in scripts/ab_pipelined_fetch.py)."""
        metrics = []
        run = _get_run(states[0])
        # dispatch all devices first (async), then collect
        for st in states:
            ts, rl, node, key, total = st
            key, kep = jax.random.split(key)
            ts, rl, node, m, total = run(ts, rl, node, kep,
                                         jnp.int32(i_episode), total)
            st[0], st[1], st[2], st[3], st[4] = ts, rl, node, key, total
            metrics.append(m)
        if block:
            jax.block_until_ready([m.reward for m in metrics])
        return states, metrics

    return init_fn, step_fn


# ---------------------------------------------------------------------------
# Data-parallel TRAINING (the user-invocable --dp mode)
# ---------------------------------------------------------------------------

def make_dp_episode_runner(cfg: NLBACConfig, n_devices: int,
                           devices=None):
    """Build the FULL episode program data-parallel over ``n_devices``:
    the update batches inside the fused while_loop are sharded over a
    1-D ('dp',) mesh (sharding constraints in agent/update.py), so GSPMD
    turns every batch-mean reduction — gradients included — into psums
    over ICI while env stepping / replay / supervisor state stays
    replicated.  Certified: a multi-episode dp training run reproduces
    the single-device run to f32 tolerance (__graft_entry__.py
    dryrun_multichip step 5; tests/test_parallel.py).

    Returns ``(place, run_fn)``: ``place`` replicates the training state
    over the mesh (call it once on (ts, rl, node, ...)); ``run_fn`` has
    the plain episode-runner signature.  ``cfg.sac.batch_size`` and
    ``cfg.node.max_batch`` must divide ``n_devices`` evenly — validated
    loudly here, not silently padded."""
    from nlbac_tpu.train.driver import make_episode_runner

    for name, val in (("sac.batch_size", cfg.sac.batch_size),
                      ("node.max_batch", cfg.node.max_batch)):
        if val % n_devices != 0:
            raise ValueError(
                f"--dp {n_devices} requires cfg.{name} ({val}) to be "
                f"divisible by the dp width (uneven shards would change "
                f"the batch-mean normalization)")
    mesh = make_mesh((n_devices,), ("dp",), devices=devices)
    replicated = NamedSharding(mesh, P())

    def place(tree):
        return jax.device_put(tree, replicated)

    run_fn = jax.jit(make_episode_runner(cfg, dp_mesh=mesh))
    return place, run_fn


# ---------------------------------------------------------------------------
# Data-parallel update
# ---------------------------------------------------------------------------

def make_dp_update(cfg: NLBACConfig, mesh: Mesh, dp_axis: str = "dp"):
    """Build ``dp_update(ts, batch, node_batch, key, i_episode)`` with the
    batch axes sharded over ``dp_axis`` and parameters replicated.

    The function body is the UNCHANGED single-chip update; the sharding
    annotations alone make GSPMD insert the gradient psums (ICI
    collectives) — the 'annotate shardings, let XLA insert collectives'
    recipe."""
    agent = make_agent(cfg)

    def batch_sharding(x):
        return NamedSharding(mesh, P(dp_axis, *([None] * (x.ndim - 1))))

    replicated = NamedSharding(mesh, P())

    def place(ts, batch, node_batch, key):
        ts = jax.tree.map(lambda x: jax.device_put(x, replicated), ts)
        batch = {k: jax.device_put(v, batch_sharding(v))
                 for k, v in batch.items()}
        node_batch = {k: jax.device_put(v, batch_sharding(v))
                      for k, v in node_batch.items()}
        key = jax.device_put(key, replicated)
        return ts, batch, node_batch, key

    @jax.jit
    def dp_update(ts, batch, node_batch, key, i_episode):
        return agent.update_from_batch(ts, batch, node_batch, key,
                                       i_episode)

    return place, dp_update


# ---------------------------------------------------------------------------
# Tensor-parallel TRAINING (the user-invocable --tp mode)
# ---------------------------------------------------------------------------

def make_tp_episode_runner(cfg: NLBACConfig, tp: int, dp: int = 1,
                           devices=None):
    """Build the FULL episode program tensor-parallel over ``tp`` devices
    (optionally composed with data-parallelism on a ('dp', 'tp') mesh):
    every network's parameters — and, mirroring their tree structure
    exactly, the target networks and Adam moments — are Megatron-sharded
    over the 'tp' axis by :func:`shard_state_tp`, while env stepping /
    replay / supervisor state stays replicated.  The episode program
    itself is UNCHANGED; GSPMD propagates the parameter layouts through
    the while_loop-carried state and inserts the all-reduces (row-parallel
    partial sums) over ICI.

    At the reference's widths (hidden <= 256) this is a throughput LOSS on
    real hardware — the mode exists so grown models shard without code
    changes, and its numerics are certified == single-device (f32
    tolerance) in tests/test_parallel.py and dryrun_multichip.
    MEASURED grown-width story (r4, one v5e chip, scripts/
    bench_grown_width.py, PARITY.md "Grown widths"): hidden 512 is
    FREE single-chip (0.99x the 256-width steps/s — the program is
    latency-bound, not FLOP-bound, at these widths) and hidden 1024
    costs 0.56x; state memory is 6.6 / 24.2 / 93.9 MB at 256/512/1024
    — far under one chip's HBM, so tp's memory case begins at widths
    ~an order of magnitude beyond the reference (state ~1.5 GB at
    hidden 4096), and below that single-chip (or dp/seed-parallel)
    is always the right tool.

    ``dp > 1`` adds batch sharding over the 'dp' axis of the same mesh
    (the Megatron DP x TP layout): batches shard over 'dp' and replicate
    over 'tp'; params shard over 'tp' and replicate over 'dp'.

    Returns ``(place, run_fn)`` with the same contract as
    :func:`make_dp_episode_runner`."""
    from nlbac_tpu.train.driver import make_episode_runner

    if dp > 1:
        _validate_batches_divisible(cfg, dp)
    # Loud failure beats silent loss (the dp path's divisibility rule):
    # if the main networks' hidden dim doesn't divide tp, EVERY layer
    # falls into shard_params_tp's replicate branch and N devices do
    # fully redundant identical work — the opposite of the mode's
    # purpose. Per-net odd dims (scalar heads, NODE nets) may still
    # replicate; the hidden dim is what makes the mode shard anything.
    if cfg.sac.hidden_dim % tp != 0:
        raise ValueError(
            f"--tp {tp} requires cfg.sac.hidden_dim "
            f"({cfg.sac.hidden_dim}) to be divisible by the tp width — "
            f"otherwise no layer shards and the run is fully-replicated "
            f"redundant work")
    mesh = make_mesh((dp, tp), ("dp", "tp"), devices=devices)
    replicated = NamedSharding(mesh, P())

    def place(tree):
        """TP-shard the TrainState (tree[0]); replicate everything else.
        ONE batched jax.device_put for the whole tuple (per-leaf puts
        each pay a tunnel round trip on the axon backend — CLAUDE.md).

        Takes a PLAIN tuple ``(ts, ...)`` — passing the TrainState bare
        would silently index into its fields (it is itself a tuple), so
        that misuse fails loudly instead."""
        if type(tree) is not tuple or not tree:
            raise TypeError(
                "place() takes a plain tuple (train_state, ...); got "
                f"{type(tree).__name__} — wrap the TrainState in a tuple")
        ts, rest = tree[0], tree[1:]
        shardings = (_tp_state_shardings(ts, mesh),) + tuple(
            jax.tree.map(lambda _: replicated, r) for r in rest)
        return jax.device_put(tree, shardings)

    run_fn = jax.jit(make_episode_runner(
        cfg, dp_mesh=mesh if dp > 1 else None))
    return place, run_fn


def _validate_batches_divisible(cfg: NLBACConfig, dp: int) -> None:
    """Batch axes must split evenly over dp (uneven shards would change
    the batch-mean normalization) — shared by the dp and dp x tp
    runners."""
    for name, val in (("sac.batch_size", cfg.sac.batch_size),
                      ("node.max_batch", cfg.node.max_batch)):
        if val % dp != 0:
            raise ValueError(
                f"--dp {dp} requires cfg.{name} ({val}) to be "
                f"divisible by the dp width (uneven shards would "
                f"change the batch-mean normalization)")


def _tp_state_shardings(tree, mesh: Mesh, tp_axis: str = "tp"):
    """A sharding pytree matching ``tree``: Megatron col/row layouts for
    every MLP parameter dict (``{"w", "b"}``), replicated everywhere
    else.

    Target networks and Adam moments mirror their parameter trees
    exactly, so the deterministic column/row alternation lands IDENTICAL
    layouts on params, targets, and optimizer state — the elementwise
    optimizer update then runs fully sharded with no resharding."""
    replicated = NamedSharding(mesh, P())
    ntp = mesh.shape[tp_axis]

    def walk(node):
        if node is None:  # None is an empty pytree: no sharding leaf
            return None
        if isinstance(node, dict):
            if set(node) == {"w", "b"}:
                specs = _tp_param_specs(node, ntp, tp_axis)
                return jax.tree.map(
                    lambda s: NamedSharding(mesh, s), specs,
                    is_leaf=lambda x: isinstance(x, P))
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, tuple):
            vals = [walk(v) for v in node]
            return (type(node)(*vals) if hasattr(node, "_fields")
                    else tuple(vals))
        if isinstance(node, list):
            return [walk(v) for v in node]
        return replicated

    return walk(tree)


def shard_state_tp(tree, mesh: Mesh, tp_axis: str = "tp"):
    """Place a pytree with :func:`_tp_state_shardings` layouts in ONE
    batched ``jax.device_put`` (per-leaf puts each pay a tunnel round
    trip on the axon backend)."""
    return jax.device_put(tree, _tp_state_shardings(tree, mesh, tp_axis))


# ---------------------------------------------------------------------------
# Tensor-parallel sharding hooks
# ---------------------------------------------------------------------------

def _tp_param_specs(params, ntp: int, tp_axis: str):
    """PartitionSpecs for one MLP param dict: alternate layers split the
    output dim (column-parallel) and the input dim (row-parallel); dims
    that don't divide ``ntp`` (e.g. the final scalar head) stay
    replicated, so the layout is safe on every net in the zoo."""
    w_specs, b_specs = [], []
    want_col = True
    for w, b in zip(params["w"], params["b"]):
        din, dout = w.shape
        if want_col and dout % ntp == 0:
            w_specs.append(P(None, tp_axis))
            b_specs.append(P(tp_axis))
            want_col = False
        elif not want_col and din % ntp == 0:
            w_specs.append(P(tp_axis, None))
            b_specs.append(P())
            want_col = True
        else:  # non-divisible dim: replicate this layer
            w_specs.append(P())
            b_specs.append(P())
    return {"w": w_specs, "b": b_specs}


def shard_params_tp(params, mesh: Mesh, tp_axis: str = "tp"):
    """Megatron-style sharding annotations for an MLP param tree — the
    SURVEY §2.3 'sharding-annotation hooks so pjit can shard if models
    grow'. Not needed at the reference's widths (<=256), but the hook
    makes any ``mlp_apply`` consumer TP-ready: running the unchanged
    apply under jit lets GSPMD insert the all-reduces over ICI.
    Layouts per :func:`_tp_param_specs`; ONE batched device_put."""
    specs = _tp_param_specs(params, mesh.shape[tp_axis], tp_axis)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings)
