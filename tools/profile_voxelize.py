"""Microbenchmark the voxelizer's constituent ops on the current backend to
attribute its cost, plus an async-pipelined throughput run to split true
device time from per-call dispatch overhead.

Usage: python tools/profile_voxelize.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import synthetic_cloud
from det3d_tpu.config import load_config
from det3d_tpu.ops.anchor_mask import compute_anchors_mask
from det3d_tpu.ops.voxelize import VoxelizerSpec, voxelize
from det3d_tpu.pipeline import Detector
from det3d_tpu.utils.timing import time_fn


def thru(fn, *args, iters=30):
    """Async-pipelined: enqueue all, sync once → amortized device time."""
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = load_config("configs/ntusl_20cm.json", max_points=120_000)
    spec = VoxelizerSpec.from_config(cfg)
    det = Detector(cfg)

    pts = jax.device_put(synthetic_cloud(cfg.max_points, 100_000))
    n = jax.device_put(np.int32(100_000))
    cell_ids = jax.device_put(
        np.random.RandomState(0).randint(0, 640_000, 120_000).astype(np.int32)
    )

    sort_i32 = jax.jit(lambda x: jnp.argsort(x, stable=True))
    sort_plain = jax.jit(lambda x: jnp.sort(x))
    gather_rows = jax.jit(lambda p, o: p[o])
    scatter_rows = jax.jit(
        lambda p, idx: jnp.zeros((spec.max_voxels * spec.max_num_points, 4), jnp.float32)
        .at[idx]
        .set(p, mode="drop", unique_indices=True)
    )
    cummax = jax.jit(lambda x: jax.lax.cummax(x))
    vox_fcfs = jax.jit(lambda p, m: voxelize(p, m, spec, fcfs=True))
    vox_plain = jax.jit(lambda p, m: voxelize(p, m, spec, fcfs=False))
    frame = jax.block_until_ready(vox_fcfs(pts, n))
    amask = jax.jit(
        lambda c: compute_anchors_mask(c, det._corner_cells, (cfg.grid_size[0], cfg.grid_size[1]))
    )

    order = jax.block_until_ready(sort_i32(cell_ids))
    idx = jax.device_put(
        np.random.RandomState(1).permutation(240_000)[:120_000].astype(np.int32)
    )

    rows = [
        ("argsort 120k i32 (stable)", sort_i32, (cell_ids,)),
        ("sort 120k i32", sort_plain, (cell_ids,)),
        ("gather 120k x4 rows", gather_rows, (pts, order)),
        ("scatter 120k x4 rows", scatter_rows, (pts, idx)),
        ("cummax 120k", cummax, (cell_ids,)),
        ("voxelize fcfs", vox_fcfs, (pts, n)),
        ("voxelize cell-order", vox_plain, (pts, n)),
        ("anchor_mask", amask, (frame.coors,)),
        ("preprocess fused", jax.jit(det.preprocess), (pts, n)),
    ]
    for name, fn, args in rows:
        t = time_fn(fn, *args, iters=10)
        a = thru(fn, *args, iters=20)
        print(f"{name:28s} sync_p50={t['p50_ms']:8.2f}ms  async_amortized={a:8.2f}ms")


if __name__ == "__main__":
    main()
