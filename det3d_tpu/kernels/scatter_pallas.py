"""Pallas TPU kernel: pillar features → dense BEV canvas.

TPU-native replacement for the XLA scatter in models/pointpillars.scatter_to_bev
(counterpart of the reference's per-sample loop / inline CUDA kernel,
reference: networks/pointpillars8_shared.py:63-111,
networks/pointpillars8_trt.py:176-193). XLA lowers the 16k-row scatter to a
serialized per-index update (~1.5 ms/frame incl. the zero-init).

Formulation (MXU one-hot scatter — Mosaic has no unaligned per-row dynamic
stores, so a row-at-a-time copy loop is not expressible):

  host-free prep (XLA): flat canvas row per pillar, one small sort of the
  16k (row, features) pairs, and a searchsorted for per-tile pillar ranges;
  kernel: canvas tile k covers rows [k·T, (k+1)·T); its pillars are the
  contiguous sorted range [starts[k], starts[k+1]). That range is walked in
  lane-aligned 128-pillar chunks, and each chunk lands via a one-hot
  matmul on the MXU:  P[r, j] = (rows[chunk_j] == base + r)  (T, 128),
  canvas_tile += P @ feats[chunk]  — exact, because canvas cells are unique
  (one pillar per cell), so every output row receives at most one nonzero
  term and matmul-accumulate never rounds.

Total work ≈ (V/128 + ntiles)·T·128·C MACs ≈ 15 GFLOP for the 800²x64
canvas — ~0.2 ms of MXU time vs ~1.5 ms for the serialized XLA scatter.
The chunk starts are multiples of 128 by construction (`pl.multiple_of`),
which is what makes the dynamic slices legal on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128  # pillar chunk per matmul; = lane width, keeps slices aligned


def _canvas_kernel(starts_ref, rows_ref, feats_ref, out_ref, *, tile: int):
    # starts arrives via scalar prefetch (SMEM): chunk loop bounds are cheap
    # scalar reads; rows live in VMEM as a (1, Vpad) lane vector for the
    # one-hot compare. Grid (batch, ntiles): one pallas_call for the batch.
    bi = pl.program_id(0)
    k = pl.program_id(1)
    out_ref[:] = jnp.zeros_like(out_ref)
    lo = starts_ref[bi, k]
    hi = starts_ref[bi, k + 1]
    base = k * tile
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, _CHUNK), 0) + base

    def body(j, _):
        a = pl.multiple_of(j * _CHUNK, _CHUNK)
        rchunk = rows_ref[0, 0:1, pl.ds(a, _CHUNK)]     # (1, 128) int32
        fchunk = feats_ref[0, pl.ds(a, _CHUNK), :]      # (128, C)
        onehot = (row_ids == rchunk).astype(fchunk.dtype)
        hit = jax.lax.dot_general(
            onehot, fchunk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] += hit.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(lo // _CHUNK, _chunk_hi(lo, hi), body, 0)


def _chunk_hi(lo, hi):
    """Exclusive chunk-loop bound: an EMPTY range (lo == hi) must run ZERO
    chunks — the naive ceil(hi/CHUNK) still runs one matmul whenever lo is
    not chunk-aligned, and most canvas tiles of a radially-sparse cloud are
    empty (the round-3 subtile kernel carried this guard; the dense kernels
    had been paying the wasted zero-output matmuls all along)."""
    return jnp.where(hi > lo, (hi + _CHUNK - 1) // _CHUNK, lo // _CHUNK)


def _pick_tile(nrows: int, cap: int = 4096) -> int:
    """Largest canvas-tile candidate ≤ cap that divides nrows. The s2d
    variant passes a lower cap: its one-hot matmul spends 4C output lanes
    per chunk, so smaller tiles keep the per-chunk MAC count bounded.

    Every candidate is a multiple of 8: Mosaic requires the (tile, C) output
    block to be sublane-aligned, and sub-8 tiles only ever passed in
    interpret mode (round-2 advisor finding). Grids whose nrows no such
    candidate divides fall back to tile=8 — the callers pad the canvas rows
    up to a tile multiple, so non-dividing tiles stay legal."""
    for t in (4096, 4000, 3200, 2560, 2048, 2000, 1600, 1024, 1000, 800, 512,
              400, 256, 128, 64, 40, 32, 16, 8):
        if t <= cap and nrows % t == 0:
            return t
    return 8


def _canvas_s2d_kernel(starts_ref, rows_ref, phase_ref, feats_ref, out_ref, *, tile: int):
    """4-phase space-to-depth variant: canvas tile (T, 4C), pillar (r2, p)
    lands at row r2, lane block p·C — the phase placement happens by widening
    the feats chunk (masked per-phase copies) before ONE one-hot matmul, the
    same MAC count as four per-phase matmuls but a single MXU dispatch.

    Grid is (batch, ntiles): the whole batch runs in ONE pallas_call (a
    per-sample python loop + stack cost an extra full-canvas copy and B
    dispatches; the rows/phase/feats blocks are batch-indexed, the per-tile
    output block is (1, tile, 4C))."""
    bi = pl.program_id(0)
    k = pl.program_id(1)
    _s2d_accumulate_range(
        starts_ref[bi, k], starts_ref[bi, k + 1], k * tile,
        rows_ref, phase_ref, feats_ref, out_ref.at[0], tile,
    )


def _s2d_accumulate_range(lo, hi, base, rows_ref, phase_ref, feats_ref,
                          out_slot, tile: int):
    """Shared s2d chunk loop: accumulate the sorted pillar range [lo, hi)
    into `out_slot` (a (tile, 4C) ref view) whose first row is GLOBAL flat
    canvas row `base`. Used by the plain and the blocked-halo kernels."""
    out_slot[:] = jnp.zeros_like(out_slot)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, _CHUNK), 0) + base

    def body(j, _):
        a = pl.multiple_of(j * _CHUNK, _CHUNK)
        rchunk = rows_ref[0, 0:1, pl.ds(a, _CHUNK)]     # (1, 128) int32
        pchunk = phase_ref[0, 0:1, pl.ds(a, _CHUNK)]    # (1, 128) int32
        fchunk = feats_ref[0, pl.ds(a, _CHUNK), :]      # (128, C)
        wide = jnp.concatenate(
            [
                jnp.where(pchunk.T == p, fchunk, jnp.zeros_like(fchunk))
                for p in (0, 1, 2, 3)
            ],
            axis=1,
        )                                               # (128, 4C)
        onehot = (row_ids == rchunk).astype(fchunk.dtype)
        hit = jax.lax.dot_general(
            onehot, wide, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_slot[:] += hit.astype(out_slot.dtype)
        return 0

    jax.lax.fori_loop(lo // _CHUNK, _chunk_hi(lo, hi), body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def scatter_to_bev_s2d_pallas(
    pillar_features: jax.Array,  # (B, V, C)
    coors: jax.Array,            # (B, V, 3) int32, -1 rows dropped
    grid_xy: tuple[int, int],
    interpret: bool = False,
    w_major: bool = False,
) -> jax.Array:                  # (B, nx/2, ny/2, 4C)
    """Pillar scatter directly into the 4-phase space-to-depth canvas
    (phase = (x%2)·2 + y%2, channel block phase·C) consumed by the packed
    entry conv (models/pointpillars.PackedConv kind='entry'). Differentiable
    like scatter_to_bev_pallas (transpose = per-pillar row/lane gather).

    `w_major=True` emits the canvas physically W-major ([W][H][C] memory,
    flat row = y2·nx2 + x2) and returns the logical (B, nx2, ny2, 4C) via a
    transpose: XLA's space-to-batch transform wants exactly the W-major
    layout for the batch-1 entry conv operand, so layout assignment folds
    the transpose into the operand layout and the full-canvas H↔W relayout
    copy between the custom call and the conv disappears. Train-path
    callers (space-to-batch fenced out) keep the default H-major order.

    (A round-3 sub-tile-skipping variant — empty row ranges skipping their
    one-hot matmuls via dynamic fori_loop bounds — measured SLOWER than this
    dense kernel at every setting on chip: the data-dependent trip counts
    defeat Mosaic's static pipelining. BASELINE.md "Round-3 final lever
    A/Bs"; deleted in round 4.)"""
    return _scatter_s2d_fwd_impl(pillar_features, coors, grid_xy, interpret, w_major)


def _scatter_s2d_fwd(pillar_features, coors, grid_xy, interpret, w_major):
    return (
        _scatter_s2d_fwd_impl(pillar_features, coors, grid_xy, interpret, w_major),
        coors,
    )


def _scatter_s2d_bwd(grid_xy, interpret, w_major, coors, g):
    # 4D gather straight off the (B, nx/2, ny/2, 4, C) cotangent — only the
    # minor-axis (4C)→(4,C) split, which is layout-free. A flat
    # (B, nrows·4, C) reshape here forced full-canvas relayout copies under
    # the training graph's space-to-batch conv layouts (round-3 trace).
    nx, ny = grid_xy
    b, v, _ = coors.shape
    c = g.shape[-1] // 4
    g5 = g.reshape(b, nx // 2, ny // 2, 4, c)
    valid = coors[..., 0] >= 0
    x2 = jnp.where(valid, coors[..., 0] // 2, 0)
    y2 = jnp.where(valid, coors[..., 1] // 2, 0)
    phase = jnp.where(valid, (coors[..., 0] % 2) * 2 + coors[..., 1] % 2, 0)
    bi = jnp.arange(b, dtype=jnp.int32)[:, None]
    dfeats = g5[bi, x2, y2, phase]                      # (B, V, C)
    return jnp.where(valid[..., None], dfeats, 0.0), None


scatter_to_bev_s2d_pallas.defvjp(_scatter_s2d_fwd, _scatter_s2d_bwd)


@functools.partial(jax.jit, static_argnames=("grid_xy", "interpret", "w_major"))
def _scatter_s2d_fwd_impl(
    pillar_features: jax.Array,
    coors: jax.Array,
    grid_xy: tuple[int, int],
    interpret: bool = False,
    w_major: bool = False,
) -> jax.Array:
    nx, ny = grid_xy
    assert nx % 2 == 0 and ny % 2 == 0
    b, v, c = pillar_features.shape
    nx2, ny2 = nx // 2, ny // 2
    nrows = nx2 * ny2
    tile = _pick_tile(nrows, cap=2000)
    nrows_pad = -(-nrows // tile) * tile  # invalid pillars land in [nrows, pad)
    ntiles = nrows_pad // tile
    vpad = ((v + _CHUNK - 1) // _CHUNK) * _CHUNK

    def prep(feats, crs):
        valid = crs[:, 0] >= 0
        if w_major:
            rows = jnp.where(valid, (crs[:, 1] // 2) * nx2 + crs[:, 0] // 2, nrows_pad)
        else:
            rows = jnp.where(valid, (crs[:, 0] // 2) * ny2 + crs[:, 1] // 2, nrows_pad)
        phase = jnp.where(valid, (crs[:, 0] % 2) * 2 + crs[:, 1] % 2, 0)
        rows_sorted, phase_sorted, perm = jax.lax.sort(
            (rows.astype(jnp.int32), phase.astype(jnp.int32),
             jnp.arange(v, dtype=jnp.int32)),
            num_keys=1,
        )
        feats_sorted = feats[perm]
        if vpad != v:
            rows_sorted = jnp.pad(rows_sorted, (0, vpad - v), constant_values=nrows_pad)
            phase_sorted = jnp.pad(phase_sorted, (0, vpad - v))
            feats_sorted = jnp.pad(feats_sorted, ((0, vpad - v), (0, 0)))
        bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * tile
        starts = jnp.searchsorted(rows_sorted, bounds, side="left").astype(jnp.int32)
        return starts, rows_sorted, phase_sorted, feats_sorted

    starts, rows_s, phase_s, feats_s = jax.vmap(prep)(pillar_features, coors)

    kernel = functools.partial(_canvas_s2d_kernel, tile=tile)
    canvas = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # starts (B, ntiles+1) → SMEM
            grid=(b, ntiles),
            in_specs=[
                # rows/phase carry a dummy middle dim: Mosaic requires the
                # LAST TWO block dims be (8,128)-divisible or full-size, so
                # (1, 1, vpad) blocks of a (B, 1, vpad) array are legal where
                # (1, vpad) blocks of (B, vpad) are not (B>1 train shapes)
                pl.BlockSpec((1, 1, vpad), lambda bi, k, starts: (bi, 0, 0),
                             memory_space=pltpu.VMEM),       # rows
                pl.BlockSpec((1, 1, vpad), lambda bi, k, starts: (bi, 0, 0),
                             memory_space=pltpu.VMEM),       # phase
                pl.BlockSpec((1, vpad, c), lambda bi, k, starts: (bi, 0, 0),
                             memory_space=pltpu.VMEM),       # feats
            ],
            out_specs=pl.BlockSpec(
                (1, tile, 4 * c), lambda bi, k, starts: (bi, k, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, nrows_pad, 4 * c), pillar_features.dtype),
        interpret=interpret,
    )(starts, rows_s[:, None, :], phase_s[:, None, :], feats_s)
    if w_major:
        return canvas[:, :nrows].reshape(b, ny2, nx2, 4 * c).swapaxes(1, 2)
    return canvas[:, :nrows].reshape(b, nx2, ny2, 4 * c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def scatter_to_bev_pallas(
    pillar_features: jax.Array,  # (B, V, C)
    coors: jax.Array,            # (B, V, 3) int32, -1 rows dropped
    grid_xy: tuple[int, int],
    interpret: bool = False,
) -> jax.Array:                  # (B, nx, ny, C)
    """Differentiable (custom VJP): the scatter is linear in the features
    and canvas cells are unique, so the backward pass is the transpose —
    a per-pillar row gather of the cotangent canvas (pallas_call itself has
    no autodiff rule; without this, jax.grad through the model dies)."""
    return _scatter_fwd_impl(pillar_features, coors, grid_xy, interpret)


def _scatter_fwd(pillar_features, coors, grid_xy, interpret):
    out = _scatter_fwd_impl(pillar_features, coors, grid_xy, interpret)
    return out, coors


def _scatter_bwd(grid_xy, interpret, coors, g):
    # 4D gather off (B, nx, ny, C) directly — no flat reshape (layout copies
    # under space-to-batch conv layouts; see _scatter_s2d_bwd)
    b = coors.shape[0]
    valid = coors[..., 0] >= 0
    x = jnp.where(valid, coors[..., 0], 0)
    y = jnp.where(valid, coors[..., 1], 0)
    bi = jnp.arange(b, dtype=jnp.int32)[:, None]
    dfeats = g[bi, x, y]
    return jnp.where(valid[..., None], dfeats, 0.0), None


scatter_to_bev_pallas.defvjp(_scatter_fwd, _scatter_bwd)


@functools.partial(jax.jit, static_argnames=("grid_xy", "interpret"))
def _scatter_fwd_impl(
    pillar_features: jax.Array,
    coors: jax.Array,
    grid_xy: tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    nx, ny = grid_xy
    b, v, c = pillar_features.shape
    nrows = nx * ny
    tile = _pick_tile(nrows)
    nrows_pad = -(-nrows // tile) * tile  # invalid pillars land in [nrows, pad)
    ntiles = nrows_pad // tile
    vpad = ((v + _CHUNK - 1) // _CHUNK) * _CHUNK

    def prep(feats, crs):
        rows = jnp.where(crs[:, 0] >= 0, crs[:, 0] * ny + crs[:, 1], nrows_pad)
        rows_sorted, perm = jax.lax.sort(
            (rows.astype(jnp.int32), jnp.arange(v, dtype=jnp.int32)), num_keys=1
        )
        feats_sorted = feats[perm]
        if vpad != v:
            rows_sorted = jnp.pad(rows_sorted, (0, vpad - v), constant_values=nrows_pad)
            feats_sorted = jnp.pad(feats_sorted, ((0, vpad - v), (0, 0)))
        bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * tile
        starts = jnp.searchsorted(rows_sorted, bounds, side="left").astype(jnp.int32)
        return starts, rows_sorted, feats_sorted

    starts, rows_s, feats_s = jax.vmap(prep)(pillar_features, coors)

    canvas = pl.pallas_call(
        functools.partial(_canvas_kernel, tile=tile),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # starts (B, ntiles+1) → SMEM
            grid=(b, ntiles),
            in_specs=[
                # (1, 1, vpad) dummy-middle-dim block — see the s2d variant
                pl.BlockSpec((1, 1, vpad), lambda bi, k, starts: (bi, 0, 0),
                             memory_space=pltpu.VMEM),       # rows
                pl.BlockSpec((1, vpad, c), lambda bi, k, starts: (bi, 0, 0),
                             memory_space=pltpu.VMEM),       # feats
            ],
            out_specs=pl.BlockSpec(
                (1, tile, c), lambda bi, k, starts: (bi, k, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, nrows_pad, c), pillar_features.dtype),
        interpret=interpret,
    )(starts, rows_s[:, None, :], feats_s)
    return canvas[:, :nrows].reshape(b, nx, ny, c)


def _canvas_s2d_blocked_kernel(
    starts_ref, rows_ref, phase_ref, feats_ref, out_ref,
    *, tile: int, ntiles: int, rows_per_blk: int, halo_top: int, ny2: int,
):
    """Blocked-halo variant of `_canvas_s2d_kernel`: grid (B, nblk, ntiles).

    Output block (blk, k) covers GLOBAL flat canvas rows
    [blk_lo + k·tile, blk_lo + (k+1)·tile) with blk_lo = (blk·R − halo_top)·ny2
    — i.e. each H-block carries its neighbors' halo rows, duplicated, so the
    consumer can run block0's whole conv stack batch-over-blocks without any
    halo exchange (models/pointpillars._blocked_block0). Same one-hot MXU
    accumulation; a pillar near a block boundary simply lands in two blocks'
    ranges (both exact copies)."""
    bi = pl.program_id(0)
    blk = pl.program_id(1)
    k = pl.program_id(2)
    base = (blk * rows_per_blk - halo_top) * ny2 + k * tile  # global flat row
    _s2d_accumulate_range(
        starts_ref[bi, blk * (ntiles + 1) + k],
        starts_ref[bi, blk * (ntiles + 1) + k + 1],
        base, rows_ref, phase_ref, feats_ref, out_ref.at[0, 0], tile,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def scatter_to_bev_s2d_blocked(
    pillar_features: jax.Array,  # (B, V, C)
    coors: jax.Array,            # (B, V, 3) int32, -1 rows dropped
    grid_xy: tuple[int, int],
    nblk: int,
    halo: tuple[int, int],
    interpret: bool = False,
) -> jax.Array:                  # (B, nblk, R + ht + hb, ny/2, 4C)
    """S2d canvas emitted directly as `nblk` H-blocks with `halo` =
    (top, bottom) duplicated neighbor rows per block (zeros beyond the
    canvas edge — exactly the conv zero-padding). Feeds
    models/pointpillars._blocked_block0, which runs the entire block0
    conv stack batch-over-blocks with VALID row convs, so XLA's
    space-to-batch pad + full-canvas blocking copy of the 4C canvas
    (~2.0 ms at the 10 cm geometry) never exists.

    Differentiable (Config.block0_blocked_train): a pillar's value is
    duplicated into a neighbor block's halo when its row falls within
    `halo` of a block boundary, so the transpose is the per-pillar gather
    SUMMED over every position the pillar was written to (_blocked_bwd).

    Round-3 context (BASELINE.md): emitting blocked for the ENTRY conv only
    lost — XLA re-blocked at the unblock reshape for the residual convs.
    This variant exists to carry the blocked form through ALL of block0."""
    return _scatter_s2d_blocked_impl(
        pillar_features, coors, grid_xy, nblk, halo, interpret
    )


def _scatter_s2d_blocked_fwd(pillar_features, coors, grid_xy, nblk, halo, interpret):
    return (
        _scatter_s2d_blocked_impl(
            pillar_features, coors, grid_xy, nblk, halo, interpret
        ),
        coors,
    )


def _scatter_s2d_blocked_bwd(grid_xy, nblk, halo, interpret, coors, g):
    # Per-pillar gather off the (B, nblk, rtot, ny2, 4, C) cotangent, summed
    # over halo duplicates: pillar row r lives in block j0 = r // rb at local
    # row r − j0·rb + ht, AND in block j0+1's top halo when r ≥ (j0+1)·rb − ht,
    # AND in block j0−1's bottom halo when r < j0·rb + hb (rb > ht + hb, so
    # at most one neighbor on each side). Same 4D-gather discipline as
    # _scatter_s2d_bwd — only the minor (4C)→(4,C) split, no flat reshape.
    nx, ny = grid_xy
    b, v, _ = coors.shape
    ht, hb = halo
    c = g.shape[-1] // 4
    nx2, ny2 = nx // 2, ny // 2
    rb = nx2 // nblk
    rtot = rb + ht + hb
    g6 = g.reshape(b, nblk, rtot, ny2, 4, c)
    valid = coors[..., 0] >= 0
    r = jnp.where(valid, coors[..., 0] // 2, 0)
    y2 = jnp.where(valid, coors[..., 1] // 2, 0)
    phase = jnp.where(valid, (coors[..., 0] % 2) * 2 + coors[..., 1] % 2, 0)
    bi = jnp.arange(b, dtype=jnp.int32)[:, None]
    j0 = r // rb
    off = r - j0 * rb
    d = g6[bi, j0, off + ht, y2, phase]
    in_above = (off < hb) & (j0 > 0)          # neighbor-above's bottom halo
    ja = jnp.maximum(j0 - 1, 0)
    d = d + jnp.where(
        in_above[..., None],
        g6[bi, ja, jnp.where(in_above, off + rb + ht, 0), y2, phase],
        0.0,
    )
    in_below = (off >= rb - ht) & (j0 < nblk - 1)  # neighbor-below's top halo
    jb = jnp.minimum(j0 + 1, nblk - 1)
    d = d + jnp.where(
        in_below[..., None],
        g6[bi, jb, jnp.where(in_below, off - rb + ht, 0), y2, phase],
        0.0,
    )
    return jnp.where(valid[..., None], d, 0.0), None


@functools.partial(
    jax.jit, static_argnames=("grid_xy", "nblk", "halo", "interpret")
)
def _scatter_s2d_blocked_impl(
    pillar_features: jax.Array,
    coors: jax.Array,
    grid_xy: tuple[int, int],
    nblk: int,
    halo: tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    nx, ny = grid_xy
    assert nx % 2 == 0 and ny % 2 == 0
    b, v, c = pillar_features.shape
    nx2, ny2 = nx // 2, ny // 2
    assert nx2 % nblk == 0, (nx2, nblk)
    rb = nx2 // nblk
    ht, hb = halo
    rtot = rb + ht + hb
    nrows_blk = rtot * ny2
    tile = _pick_tile(nrows_blk, cap=2000)
    nrows_blk_pad = -(-nrows_blk // tile) * tile
    ntiles = nrows_blk_pad // tile
    vpad = ((v + _CHUNK - 1) // _CHUNK) * _CHUNK
    # invalid pillars: beyond every block's range (last block's bottom halo
    # extends hb rows past the canvas — the sentinel must clear it)
    sentinel = (nx2 + hb) * ny2 + tile

    def prep(feats, crs):
        valid = crs[:, 0] >= 0
        rows = jnp.where(valid, (crs[:, 0] // 2) * ny2 + crs[:, 1] // 2, sentinel)
        phase = jnp.where(valid, (crs[:, 0] % 2) * 2 + crs[:, 1] % 2, 0)
        rows_sorted, phase_sorted, perm = jax.lax.sort(
            (rows.astype(jnp.int32), phase.astype(jnp.int32),
             jnp.arange(v, dtype=jnp.int32)),
            num_keys=1,
        )
        feats_sorted = feats[perm]
        if vpad != v:
            rows_sorted = jnp.pad(rows_sorted, (0, vpad - v), constant_values=sentinel)
            phase_sorted = jnp.pad(phase_sorted, (0, vpad - v))
            feats_sorted = jnp.pad(feats_sorted, ((0, vpad - v), (0, 0)))
        # per-(block, tile) pillar ranges over the GLOBAL flat row order —
        # block ranges overlap by the halos, so starts are per-block curves
        blk_lo = (jnp.arange(nblk, dtype=jnp.int32) * rb - ht) * ny2  # (nblk,)
        bounds = (
            blk_lo[:, None]
            + jnp.arange(ntiles + 1, dtype=jnp.int32)[None, :] * tile
        ).reshape(-1)
        starts = jnp.searchsorted(rows_sorted, bounds, side="left").astype(jnp.int32)
        return starts, rows_sorted, phase_sorted, feats_sorted

    starts, rows_s, phase_s, feats_s = jax.vmap(prep)(pillar_features, coors)

    kernel = functools.partial(
        _canvas_s2d_blocked_kernel, tile=tile, ntiles=ntiles,
        rows_per_blk=rb, halo_top=ht, ny2=ny2,
    )
    canvas = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # starts (B, nblk*(ntiles+1)) → SMEM
            grid=(b, nblk, ntiles),
            in_specs=[
                pl.BlockSpec((1, 1, vpad), lambda bi, blk, k, starts: (bi, 0, 0),
                             memory_space=pltpu.VMEM),       # rows
                pl.BlockSpec((1, 1, vpad), lambda bi, blk, k, starts: (bi, 0, 0),
                             memory_space=pltpu.VMEM),       # phase
                pl.BlockSpec((1, vpad, c), lambda bi, blk, k, starts: (bi, 0, 0),
                             memory_space=pltpu.VMEM),       # feats
            ],
            out_specs=pl.BlockSpec(
                (1, 1, tile, 4 * c), lambda bi, blk, k, starts: (bi, blk, k, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, nblk, nrows_blk_pad, 4 * c), pillar_features.dtype
        ),
        interpret=interpret,
    )(starts, rows_s[:, None, :], phase_s[:, None, :], feats_s)
    return canvas[:, :, :nrows_blk].reshape(b, nblk, rtot, ny2, 4 * c)


scatter_to_bev_s2d_blocked.defvjp(_scatter_s2d_blocked_fwd, _scatter_s2d_blocked_bwd)
