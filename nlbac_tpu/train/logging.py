"""Metrics & logging: the reference's three channels unified
(SURVEY.md §5 observability):

1. ``EpochLogger``-style tab-separated ``progress.txt`` + formatted stdout
   tables with mean/std/min/max aggregation (UNI/utils/logx.py:275-375)
2. an optional wandb sink (gated import; UNI/main.py:276-281,157-165)
3. a config-to-JSON snapshot (``save_config`` -> config.json,
   UNI/utils/logx.py:136-160)

Plus step timers / jax.profiler hooks — the tracing capability the
reference lacks entirely (SURVEY.md §5 'Tracing: none').
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional

import numpy as np


def colorize(string: str, color: str, bold: bool = False) -> str:
    """ANSI colorizer (the reference vendors one in logx.py:34-58)."""
    colors = {"gray": 30, "red": 31, "green": 32, "yellow": 33, "blue": 34,
              "magenta": 35, "cyan": 36, "white": 37}
    attr = [str(colors.get(color, 37))]
    if bold:
        attr.append("1")
    return f"\x1b[{';'.join(attr)}m{string}\x1b[0m"


class EpochLogger:
    """Tab-separated progress writer with per-epoch statistics.

    ``store`` accumulates values within an epoch; ``log_tabular`` computes
    mean (and optionally std/min/max); ``dump_tabular`` writes one row to
    ``progress.txt`` and prints an aligned table."""

    def __init__(self, output_dir: Optional[str] = None,
                 output_fname: str = "progress.txt", quiet: bool = False,
                 backend: str = "auto"):
        """``backend``: 'auto' uses the native C++ TSV writer
        (runtime/host_buffer.cpp via nlbac_tpu.runtime_native) when its
        shared library is available and falls back to the Python file
        writer otherwise; 'python' forces the fallback; 'native' raises
        if the library can't be built. Both write the same %.6g TSV
        format (values pass through f32 in the native path — every
        logged metric is f32-originated) and flush after every row
        (live-tail semantics)."""
        self.output_dir = output_dir
        self.quiet = quiet
        self._file = None
        self._native = None
        if output_dir is not None:
            os.makedirs(output_dir, exist_ok=True)
            path = os.path.join(output_dir, output_fname)
            if backend in ("auto", "native"):
                try:
                    from nlbac_tpu.runtime_native import NativeTsvWriter
                    self._native = NativeTsvWriter(path)
                except Exception:
                    if backend == "native":
                        raise
            if self._native is None:
                self._file = open(path, "w")
        self._epoch_store: Dict[str, list] = {}
        self._row: Dict[str, float] = {}
        self._headers = None

    def save_config(self, config: Any) -> None:
        """Best-effort JSON snapshot of the run config
        (logx.py:136-160 + serialization_utils.convert_json)."""
        from nlbac_tpu.utils.serialization import convert_json
        if self.output_dir is None:
            return
        blob = json.dumps(convert_json(config), indent=2, sort_keys=True,
                          default=str)
        with open(os.path.join(self.output_dir, "config.json"), "w") as f:
            f.write(blob)

    def store(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self._epoch_store.setdefault(k, []).append(float(v))

    def log_tabular(self, key: str, value: Optional[float] = None,
                    with_min_and_max: bool = False,
                    average_only: bool = True) -> None:
        if value is not None:
            self._row[key] = float(value)
            return
        vals = self._epoch_store.pop(key, [])
        if not vals:
            self._row[key] = float("nan")
            return
        arr = np.asarray(vals)
        self._row[key] = float(arr.mean())
        if not average_only:
            self._row[f"Std{key}"] = float(arr.std())
        if with_min_and_max:
            self._row[f"Min{key}"] = float(arr.min())
            self._row[f"Max{key}"] = float(arr.max())

    def dump_tabular(self) -> None:
        keys = list(self._row.keys())
        if self._native is not None:
            if self._headers is None:
                self._headers = keys
                self._native.header(keys)
            self._native.row([self._row.get(k, float("nan"))
                              for k in self._headers])
            self._native.flush()
        elif self._file is not None:
            if self._headers is None:
                self._headers = keys
                self._file.write("\t".join(keys) + "\n")
            self._file.write(
                "\t".join(f"{self._row.get(k, float('nan')):.6g}"
                          for k in self._headers) + "\n")
            self._file.flush()
        if not self.quiet:
            width = max((len(k) for k in keys), default=8) + 2
            print("-" * (width + 17))
            for k in keys:
                print(f"| {k:<{width}}| {self._row[k]:<13.6g}|")
            print("-" * (width + 17))
        self._row = {}
        self._epoch_store = {}

    def close(self) -> None:
        if self._native is not None:
            self._native.close()
        if self._file is not None:
            self._file.close()


class MetricsSink:
    """Fan-out sink: EpochLogger + optional wandb + optional TensorBoard
    + in-memory history.

    The reference emits to wandb only (UNI/main.py:157-165); wandb is a
    hosted service and may be absent/offline (it is in this image), so
    the sink degrades gracefully AND offers a local TensorBoard event
    stream (``tensorboard_dir``) via torch.utils.tensorboard when torch
    ships one — a fully offline observability channel."""

    def __init__(self, logger: Optional[EpochLogger] = None,
                 use_wandb: bool = False, wandb_project: str = "",
                 wandb_config: Any = None,
                 tensorboard_dir: Optional[str] = None):
        self.logger = logger
        self.history = []
        self._wandb = None
        self._tb = None
        self._step = 0
        if use_wandb:
            try:
                import wandb  # noqa: F401
                self._wandb = wandb.init(project=wandb_project or "nlbac",
                                         config=wandb_config)
            except Exception as e:  # wandb absent or offline
                print(colorize(f"wandb unavailable ({e}); metrics go to "
                               "progress.txt only", "yellow"))
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=tensorboard_dir)
            except Exception as e:  # tensorboard backend absent
                print(colorize(f"tensorboard unavailable ({e}); metrics "
                               "go to progress.txt only", "yellow"))

    def log(self, metrics: Dict[str, float]) -> None:
        metrics = {k: float(v) for k, v in metrics.items()}
        self.history.append(metrics)
        if self._wandb is not None:
            self._wandb.log(metrics)
        if self._tb is not None:
            # one global step per log() call (= one episode); scalar tags
            # keep the wandb metric names so dashboards line up
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, self._step)
        self._step += 1

    def close(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()
        if self.logger is not None:
            self.logger.close()


class StepTimer:
    """Wall-clock phase timers (per-phase totals + counts)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def time(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[phase] = self.totals.get(phase, 0.0) + dt
            self.counts[phase] = self.counts.get(phase, 0) + 1

    def summary(self) -> Dict[str, str]:
        """Per-phase 'total (mean x N)' strings — totals alone read as
        per-call times and mislead for multi-call phases."""
        out = {}
        for k, tot in self.totals.items():
            n = self.counts[k]
            if n > 1:
                out[f"time/{k}"] = f"{tot:.1f}s ({tot / n:.3f}s x {n})"
            else:
                out[f"time/{k}"] = f"{tot:.1f}s"
        return out


@contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace wrapper: profile a region when log_dir is set."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
