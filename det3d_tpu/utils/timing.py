"""Stage timing + profiling utilities.

TPU-native counterpart of the reference's manual `time.time()` +
`torch.cuda.synchronize()` accumulators hard-wired into every forward pass
(reference: networks/pointpillars8_shared.py:359-380, framework/inference.py:24-127,
framework/dataset.py:208-230, train.py:244-258). Instead of polluting the
model code, timing lives here: `StageTimers` wraps jitted stage functions
with `block_until_ready`-bracketed wall timers and reports the same
pre / pfn / scatter / rpn / heads / post breakdown, and `trace` wraps a
callable in a `jax.profiler` trace for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Callable

import jax
import numpy as np


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2, **kw) -> dict:
    """Median/best wall time of `fn(*args)` with device-sync brackets."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    return {
        "p50_ms": float(np.median(times) * 1e3),
        "best_ms": float(np.min(times) * 1e3),
        "mean_ms": float(np.mean(times) * 1e3),
    }


class StageTimers:
    """Accumulate named span timings (host-side, device-synced).

    Mirrors the reference's accumulator fields (`pfn_time`, `scatter_time`,
    ... reference networks/pointpillars8_shared.py:355-359) as a dict of
    running sums + counts, printable as the familiar breakdown line."""

    def __init__(self) -> None:
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync: Any = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.total[name] += time.perf_counter() - t0
        self.count[name] += 1

    def add(self, name: str, seconds: float) -> None:
        self.total[name] += seconds
        self.count[name] += 1

    def averages(self) -> dict[str, float]:
        return {k: self.total[k] / max(self.count[k], 1) for k in self.total}

    def report(self) -> str:
        return "  ".join(f"{k}: {v * 1e3:.2f}ms" for k, v in self.averages().items())


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
