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

Measurement design: the two variants ALTERNATE IN PHASES of 8 episodes
(each owning the single device for its whole phase) rather than per
episode — with a shared chip, interleaving a non-blocking variant with a
blocking one mis-attributes the non-blocker's device time to the
blocker's wall (measured: a naive per-episode interleave reported a
bogus 7.5x). Phase alternation still samples the same tunnel-latency
window at coarse grain.

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
    episodes = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_seeds = 2
    phase_len = 8

    cfg = get_config(preset)
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=400),
        sac=dataclasses.replace(cfg.sac, start_steps=200))

    states, steps, ep_ctr = {}, {}, {}
    # SAME base seed for both variants: the per-seed key streams (hence
    # trajectories and episode lengths) are identical, so the comparison
    # isolates the loop structure — different seeds would confound it
    # with episode-length variance (early goal termination).
    for tag in ("seq", "pipe"):
        init_fn, step_fn = make_async_seed_runner(cfg, n_seeds=n_seeds)
        states[tag] = init_fn(0)
        steps[tag] = step_fn
        ep_ctr[tag] = 0

    # warmup/compile both
    for tag in ("seq", "pipe"):
        states[tag], m = steps[tag](states[tag], 0)
        _to_host(m)
        ep_ctr[tag] = 1

    walls = {"seq": [], "pipe": []}
    pending = None
    n_phases = max(2, episodes // phase_len)
    for phase in range(n_phases):
        tag = ("seq", "pipe")[phase % 2]
        if tag == "seq":
            for _ in range(phase_len):
                t0 = time.perf_counter()
                states["seq"], m = steps["seq"](states["seq"],
                                                ep_ctr["seq"])  # blocks
                _to_host(m)
                walls["seq"].append(time.perf_counter() - t0)
                ep_ctr["seq"] += 1
        else:
            for _ in range(phase_len):
                t0 = time.perf_counter()
                states["pipe"], m2 = steps["pipe"](states["pipe"],
                                                   ep_ctr["pipe"],
                                                   block=False)
                if pending is not None:
                    _to_host(pending)  # overlaps this episode's compute
                pending = m2
                walls["pipe"].append(time.perf_counter() - t0)
                ep_ctr["pipe"] += 1
            t0 = time.perf_counter()
            _to_host(pending)  # drain before handing the device back
            pending = None
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
