#!/usr/bin/env python
"""Interleaved A/B: overlap the per-episode host metric fetch with the
NEXT episode's dispatch in the --n_seeds async runner (VERDICT r2 item 7
candidate).

Variant "pipe": dispatch episode i WITHOUT blocking (step_fn block=False),
then fetch episode i-1's metrics — the D2H round trip (60ms-7s through
the axon tunnel depending on the window) overlaps episode i's device
compute, because i-1's result buffers are already final.
Variant "seq": the pre-r3 cli loop order — block on episode i, then
fetch its metrics, then dispatch i+1.

Both run the same 2-seed async runner on one chip, interleaved per
episode so they sample the same tunnel-latency window. Total work is
identical; only the fetch placement differs. Reports median wall per
episode.

Run on the TPU from the repo root:
    python scripts/ab_pipelined_fetch.py [preset] [episodes]
"""
import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax


def main():
    from nlbac_tpu.config import get_config
    from nlbac_tpu.parallel import make_async_seed_runner
    from nlbac_tpu.train.checkpoint import _to_host

    preset = sys.argv[1] if len(sys.argv) > 1 else "unicycle"
    episodes = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n_seeds = 2

    cfg = get_config(preset)
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=400),
        sac=dataclasses.replace(cfg.sac, start_steps=200))

    states, steps = {}, {}
    for tag, base_seed in (("seq", 0), ("pipe", 1000)):
        init_fn, step_fn = make_async_seed_runner(cfg, n_seeds=n_seeds)
        states[tag] = init_fn(base_seed)
        steps[tag] = step_fn

    # warmup/compile both
    for tag in ("seq", "pipe"):
        states[tag], m = steps[tag](states[tag], 0)
        _to_host(m)

    walls = {"seq": [], "pipe": []}
    pending = None
    for ep in range(1, episodes):
        t0 = time.perf_counter()
        states["seq"], m = steps["seq"](states["seq"], ep)  # blocks
        _to_host(m)
        walls["seq"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        states["pipe"], m2 = steps["pipe"](states["pipe"], ep,
                                           block=False)
        if pending is not None:
            _to_host(pending)  # overlaps episode ep's device compute
        pending = m2
        walls["pipe"].append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    _to_host(pending)  # drain: charge the final fetch to pipe
    walls["pipe"][-1] += time.perf_counter() - t0

    for tag in ("seq", "pipe"):
        med = statistics.median(walls[tag])
        mean = sum(walls[tag]) / len(walls[tag])
        print(f"{tag}: median {med*1e3:.1f} ms/ep, mean {mean*1e3:.1f} "
              f"ms/ep over {len(walls[tag])} eps")
    print(f"speedup (seq median / pipe median): "
          f"{statistics.median(walls['seq'])/statistics.median(walls['pipe']):.3f}x")


if __name__ == "__main__":
    main()
