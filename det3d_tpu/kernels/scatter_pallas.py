"""Pallas TPU kernel: pillar features → dense BEV canvas.

TPU-native replacement for the XLA scatter in models/pointpillars.scatter_to_bev
(counterpart of the reference's per-sample loop / inline CUDA kernel,
reference: networks/pointpillars8_shared.py:63-111,
networks/pointpillars8_trt.py:176-193). XLA lowers the 16k-row scatter to a
serialized per-index update (~1.5 ms/frame incl. the zero-init); here the
canvas streams out tile by tile at memory bandwidth:

  host-free prep (XLA): flat canvas row per pillar, one small sort of the
  16k (row, slot) pairs, and a searchsorted for per-tile pillar ranges;
  kernel: for canvas tile k, zero the VMEM block and copy the (few) pillar
  rows whose sorted range lands in it — rows are sorted, so each grid step
  touches a contiguous run of the (V, C) feature table resident in VMEM.

The pillar count per tile is data-dependent; the sorted ranges arrive via
scalar prefetch so the loop bound is a cheap SMEM read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _canvas_kernel(starts_ref, rows_ref, feats_ref, out_ref, *, tile: int):
    # starts/rows arrive via scalar prefetch (SMEM): the loop bound and the
    # per-pillar row index are scalar reads — a VMEM vector load at an
    # arbitrary lane offset is not expressible on TPU
    k = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)
    lo = starts_ref[k]
    hi = starts_ref[k + 1]
    base = k * tile

    def body(i, _):
        r = rows_ref[lo + i] - base
        out_ref[pl.ds(r, 1), :] = feats_ref[pl.ds(lo + i, 1), :]
        return 0

    jax.lax.fori_loop(0, hi - lo, body, 0)


@functools.partial(jax.jit, static_argnames=("grid_xy", "interpret"))
def scatter_to_bev_pallas(
    pillar_features: jax.Array,  # (B, V, C)
    coors: jax.Array,            # (B, V, 3) int32, -1 rows dropped
    grid_xy: tuple[int, int],
    interpret: bool = False,
) -> jax.Array:                  # (B, nx, ny, C)
    nx, ny = grid_xy
    b, v, c = pillar_features.shape
    nrows = nx * ny
    # pick a tile that divides the canvas; favor ~4-8k rows per block
    tile = next(t for t in (5000, 4000, 2500, 2000, 1000, 500, 100, 25, 5, 1) if nrows % t == 0)
    ntiles = nrows // tile

    def one(feats, crs):
        rows = jnp.where(crs[:, 0] >= 0, crs[:, 0] * ny + crs[:, 1], nrows)
        rows_sorted, perm = jax.lax.sort(
            (rows.astype(jnp.int32), jnp.arange(v, dtype=jnp.int32)), num_keys=1
        )
        feats_sorted = feats[perm]
        bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * tile
        starts = jnp.searchsorted(rows_sorted, bounds, side="left").astype(jnp.int32)

        canvas = pl.pallas_call(
            functools.partial(_canvas_kernel, tile=tile),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,  # starts (ntiles+1,), rows (V,) → SMEM
                grid=(ntiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # feats (V, C)
                ],
                out_specs=pl.BlockSpec(
                    (tile, c), lambda k, starts, rows: (k, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((nrows, c), feats.dtype),
            interpret=interpret,
        )(starts, rows_sorted, feats_sorted)
        return canvas.reshape(nx, ny, c)

    return jnp.stack([one(pillar_features[i], coors[i]) for i in range(b)])
