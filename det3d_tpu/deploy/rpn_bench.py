"""Standalone RPN microbenchmark.

Counterpart of the reference's `rpn_builder.py` (reference:
rpn_builder.py:108-130): time the backbone alone — the single heaviest
stage — to isolate conv throughput from the rest of the pipeline.

Benchmarks BOTH backbone variants:
  - packed  (production): pack_w=True on the space-to-depth canvas
    (B, nx/2, ny/2, 4C) — the configuration the live Detector ships
  - plain: pack_w=False on the dense (B, nx, ny, C) canvas

On TPU the measurement is profiler device time (summed TPU trace events /
iterations): on the axon relay, wall-clock of pure-XLA programs is fiction
(`block_until_ready` doesn't force execution) and repeat runs on identical
buffers can be deduped — hence distinct inputs + jax.profiler. On CPU it
falls back to wall-clock.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from det3d_tpu.config import Config
from det3d_tpu.models.pointpillars import RPN

_PROFILE_ITERS = 8  # distinct input buffers (dedup guard); device-time avg


def _device_time_ms(fn, inputs) -> float:
    """Average per-call device time from a jax.profiler trace."""
    import glob
    import gzip
    import json
    import tempfile

    import shutil

    trace_dir = tempfile.mkdtemp(prefix="rpn-bench-trace-")
    try:
        jax.profiler.start_trace(trace_dir)
        out = None
        for x in inputs:
            out = fn(x)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()

        traces = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
        if not traces:
            raise RuntimeError(
                "jax.profiler produced no trace file (profiler plugin missing "
                f"or failed on this backend?) — nothing under {trace_dir}"
            )
        with gzip.open(traces[-1]) as f:
            t = json.load(f)
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    events = t["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    total = sum(
        e.get("dur", 0)
        for e in events
        if e.get("ph") == "X"
        and "TPU" in pids.get(e["pid"], "")
        and not e["name"].startswith("jit_")
    )
    return total / len(inputs) / 1e3


def _bench_one(cfg: Config, pack_w: bool, iters: int) -> float:
    nx, ny = cfg.grid_size[0], cfg.grid_size[1]
    dtype = jnp.dtype(cfg.compute_dtype)
    rpn = RPN(compute_dtype=dtype, pack_w=pack_w)
    shape = (1, nx // 2, ny // 2, 4 * 64) if pack_w else (1, nx, ny, 64)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, shape, dtype) * 0.1
    variables = rpn.init(jax.random.PRNGKey(0), x0)
    fn = jax.jit(lambda x: rpn.apply(variables, x))
    jax.block_until_ready(fn(x0))  # compile

    if jax.default_backend() == "tpu":
        inputs = [
            jax.device_put(jax.random.normal(jax.random.PRNGKey(i + 1), shape, dtype) * 0.1)
            for i in range(min(iters, _PROFILE_ITERS))
        ]
        return _device_time_ms(fn, inputs)

    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(x0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_rpn(cfg: Config, iters: int = 100) -> dict[str, float]:
    nx, ny = cfg.grid_size[0], cfg.grid_size[1]
    dtype = jnp.dtype(cfg.compute_dtype)
    how = "device-time" if jax.default_backend() == "tpu" else "wall-clock"
    results = {}
    for label, pack in (("packed[production]", True), ("plain", False)):
        ms = _bench_one(cfg, pack, iters)
        results[label] = ms
        shape = f"{nx // 2}x{ny // 2}x256(s2d)" if pack else f"{nx}x{ny}x64"
        print(f"RPN {label:18s} {shape:20s} ({dtype}): {ms:.3f} ms avg [{how}]")
    return results
