"""Standalone RPN microbenchmark.

Counterpart of the reference's `rpn_builder.py` (reference:
rpn_builder.py:108-130): time the backbone alone on a canvas-sized input —
the single heaviest stage — to isolate conv throughput from the rest of the
pipeline. Prints avg ms over `iters` runs of a (1, nx, ny, 64) canvas.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from det3d_tpu.config import Config
from det3d_tpu.models.pointpillars import RPN


def bench_rpn(cfg: Config, iters: int = 100) -> float:
    nx, ny = cfg.grid_size[0], cfg.grid_size[1]
    dtype = jnp.dtype(cfg.compute_dtype)
    rpn = RPN(compute_dtype=dtype)
    x = jnp.zeros((1, nx, ny, 64), dtype)
    variables = rpn.init(jax.random.PRNGKey(0), x)
    fn = jax.jit(lambda v, x: rpn.apply(v, x))
    jax.block_until_ready(fn(variables, x))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, x)
    jax.block_until_ready(out)
    avg_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"RPN {nx}x{ny}x64 ({dtype}): {avg_ms:.3f} ms avg over {iters} iters")
    return avg_ms
