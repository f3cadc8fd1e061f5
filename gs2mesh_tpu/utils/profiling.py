"""Profiling and per-stage timing.

The reference's observability is CUDA-event iteration timing logged to
TensorBoard (train.py:44-45,67,95,160) plus tqdm bars. TPU equivalents:

  * `profile_trace` — context manager around `jax.profiler.trace` producing
    an XPlane trace viewable in TensorBoard / Perfetto.
  * `StageTimer` — wall-clock per-stage accumulator with JSON/CSV export
    (the pipeline's per-stage analog of `iter_time`).
  * `time_block` — one-off timed scope that blocks on JAX async dispatch.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def profile_trace(log_dir: str, create_perfetto_link: bool = False):
    """jax.profiler trace scope; writes an XPlane trace under log_dir."""
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def time_block(name: str = "block", sync=None, verbose: bool = True):
    """Timed scope; pass `sync=value` to block on a JAX value first."""
    import jax

    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    dt = time.perf_counter() - t0
    if verbose:
        print(f"[time] {name}: {dt * 1e3:.2f} ms")


class StageTimer:
    """Accumulates wall time + call counts per named stage."""

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": self.total[k], "count": self.count[k],
                    "mean_s": self.total[k] / max(self.count[k], 1)}
                for k in self.total}

    def report(self) -> str:
        lines = [f"{k:24s} {v['total_s']:9.3f}s  x{v['count']:<6d} "
                 f"({v['mean_s'] * 1e3:8.2f} ms/call)"
                 for k, v in sorted(self.summary().items())]
        return "\n".join(lines)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


class MetricLogger:
    """Append-only JSONL scalar logger (TensorBoard-scalar stand-in; the
    reference logs train loss/PSNR/iter_time, train.py:148-191)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.records = []
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, step: int, **scalars) -> None:
        rec = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        self.records.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
