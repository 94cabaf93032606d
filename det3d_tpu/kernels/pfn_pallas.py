"""Pallas TPU kernel: windowed segment reductions for the segmented PFN.

The segmented PFN (ops/pfn_segmented.py) needs, for every pillar segment
``[h, h+cnt)`` of the cell-sorted point array, the max of the folded
per-point term ``u = p @ Wp`` and the sum of the xyz columns. The pure-XLA
sparse-table formulation was measured 0.4-0.6 ms SLOWER than the dense
``(V, P, C)`` path it replaces (BASELINE.md round-4 close): building
``log2(P)`` shifted-max levels materializes ~4n·F of table traffic in HBM
(the 20 cm trace attributes ~1.1 ms to the level concat + two-row RMQ
queries alone). This kernel runs the same reduction with every
intermediate in VMEM:

  grid over static ``block_rows`` chunks of the sorted array; each step
  loads its chunk plus a ``2^K``-row halo from the next chunk (windows are
  at most ``max_num_points`` rows, so they cross at most one boundary),
  computes ``u`` with one small MXU matmul, then runs K doubling passes

      m_{t+1}[i] = max(m_t[i], wlen[i] > 2^t ? m_t[i + 2^t] : -inf)
      s_{t+1}[i] = s_t[i]  +  (wlen[i] > 2^t ? s_t[i + 2^t] : 0)

  where ``wlen[i]`` is the remaining window length at row ``i`` (packed
  into a spare lane of the point block, so there is a single input
  stream). After K passes ``m[i]`` covers ``[i, i + min(2^K, wlen))`` —
  exactly the pillar window at head rows. All shifts are STATIC value
  slices (no scalar prefetch, no data-dependent trip counts — the
  round-3 failure mode); the only HBM traffic is the point block in and
  the two per-row tables out, and the caller gathers just the V head rows.

Inference-only (no VJP): training keeps the dense PFN, which needs live
batch statistics. Reference behavior covered: the first-``P``-points cap
and segment semantics of framework/voxel_generator.py:82-106 via the
``wlen`` construction in ops/voxelize.fcfs_segments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_kernel(blk_ref, nxt_ref, wp_ref, m_ref, s_ref, *, halo: int,
                   levels: int, wlen_lane: int):
    b = blk_ref.shape[0]
    x = jnp.concatenate([blk_ref[:], nxt_ref[0:halo, :]], axis=0)  # (B+H, 8)
    wlen = x[:, wlen_lane : wlen_lane + 1]                         # (B+H, 1) f32
    # u = x[:, :c] @ wp as c rank-1 broadcast multiply-adds on the VPU.
    # (A dot_general with the 8-lane contraction dim compiled under Mosaic
    # but returned silently WRONG values on chip — the narrow contraction
    # appears to read the full 128-lane tile. Probe-isolated; the VPU form
    # is exact and the FLOPs are trivial either way.)
    wp = wp_ref[:]
    u = x[:, 0:1] * wp[0:1, :]
    for j in range(1, wlen_lane):
        u = u + x[:, j : j + 1] * wp[j : j + 1, :]                 # (B+H, F)
    f = u.shape[1]
    neg = jnp.asarray(float("-inf"), u.dtype)
    m, s = u, x
    for t in range(levels):
        d = 1 << t
        m_sh = jnp.concatenate([m[d:], jnp.full((d, f), neg, m.dtype)], axis=0)
        s_sh = jnp.concatenate([s[d:], jnp.zeros((d, s.shape[1]), s.dtype)], axis=0)
        ok = wlen > float(d)
        m = jnp.maximum(m, jnp.where(ok, m_sh, neg))
        s = s + jnp.where(ok, s_sh, 0.0)
    m_ref[:] = m[:b].astype(m_ref.dtype)
    s_ref[:] = s[:b].astype(s_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("max_window", "out_dtype", "block_rows", "interpret")
)
def pfn_window_tables(
    spoints: jax.Array,   # (n, c) f32 cell-sorted points (c <= 7)
    row_wlen: jax.Array,  # (n,) int32 remaining window length per row (<= max_window)
    wp: jax.Array,        # (c, F) f32 folded per-point weights
    max_window: int,      # static bound on window length (= max_num_points)
    out_dtype=jnp.bfloat16,
    block_rows: int = 2048,
    interpret: bool = False,
):
    """Per-row windowed suffix tables over the sorted point array.

    Returns ``(m, s)`` with ``m[i] = max(u[i : i+wlen[i]])`` in `out_dtype`
    (f32 accumulation) and ``s[i, :c] = sum(spoints[i : i+wlen[i]])`` in
    f32; rows with ``wlen <= 0`` return ``u[i]`` / ``spoints[i]`` (callers
    only read head rows). The caller gathers head rows to get per-pillar
    max/sums — V rows instead of the dense path's V·P-row window gather.
    """
    n, c = spoints.shape
    assert c < 8, c
    f = wp.shape[1]
    levels = max(1, int(max_window - 1).bit_length()) if max_window > 1 else 1
    halo = max(8, 1 << levels)
    if n >= block_rows:
        b = block_rows
    else:  # single-block shapes (tests): round n up to one grid step
        b = max(halo, -(-n // 8) * 8)
    assert halo <= b, (halo, b)
    n_pad = -(-n // b) * b
    nb = n_pad // b

    # one input stream: point lanes [0, c), window length in lane c
    # (exact in f32 for any realistic cap), zero pad to 8 lanes
    x = jnp.zeros((n_pad, 8), jnp.float32)
    x = x.at[:n, :c].set(spoints.astype(jnp.float32))
    x = x.at[:n, c].set(row_wlen.astype(jnp.float32))
    wp8 = jnp.zeros((8, f), jnp.float32).at[:c].set(wp.astype(jnp.float32))

    kernel = functools.partial(
        _window_kernel, halo=halo, levels=levels, wlen_lane=c
    )
    m, s = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((b, 8), lambda i: (i, 0)),
            # next block as a second view of the same array = static halo
            pl.BlockSpec((b, 8), lambda i: (jnp.minimum(i + 1, nb - 1), 0)),
            pl.BlockSpec((8, f), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, f), lambda i: (i, 0)),
            pl.BlockSpec((b, 8), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, f), jnp.dtype(out_dtype)),
            jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, wp8)
    return m[:n], s[:n]
