"""On-device pillar voxelization (vectorized XLA; no host round-trips).

TPU-native replacement for the reference's sequential numba CPU kernel
(reference: framework/voxel_generator.py:82-106). The reference bins points
first-come-first-serve into dense `(max_voxels, max_num_points, C)` buffers
using a mutable dense `coor_to_voxelidx` map. On TPU we reproduce the same
contract with one stable sort + parallel scans:

  1. every point gets a linear cell id (out-of-range → sentinel that sorts
     last);
  2. a stable argsort groups points by cell while preserving arrival order
     within each cell — so the "first `max_num_points` points of each pillar"
     cap is bit-identical to the reference;
  3. segment heads are found by comparing adjacent sorted ids; a `cummax`
     scan gives every point its segment start, hence its slot within the
     pillar, with no scatter;
  4. pillar slots are assigned either in first-occurrence order (`fcfs=True`,
     reference-identical pillar selection when `max_voxels` binds — one extra
     argsort) or in cell-id order (`fcfs=False`, cheaper; downstream results
     are identical whenever the pillar count fits the cap, because every
     consumer — PFN max-pool, BEV scatter, anchor mask — is order-invariant).

Known, documented divergence: when the pillar cap binds, the reference stops
consuming points entirely at the first over-cap *new* cell (voxel_generator.py:
96-97 `break`), dropping later points even for already-open pillars; this
vectorized version keeps filling open pillars to their point cap. The kept
*pillar set* is identical in fcfs mode.

All shapes are static: callers pad the point cloud to `max_points` rows and
pass the true count; padding rows are treated as out-of-range.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from det3d_tpu.config import Config


class VoxelizerSpec(NamedTuple):
    """Static voxelization parameters (hashable; safe as a jit static arg)."""

    voxel_size: tuple[float, float, float]
    offset: tuple[float, float, float]          # snapped detection offset
    grid_size: tuple[int, int, int]             # (nx, ny, nz)
    max_voxels: int
    max_num_points: int

    @classmethod
    def from_config(cls, cfg: Config) -> "VoxelizerSpec":
        return cls(
            voxel_size=tuple(cfg.voxel_size),
            offset=tuple(cfg.detection_offset),
            grid_size=tuple(cfg.grid_size),
            max_voxels=cfg.max_voxels,
            max_num_points=cfg.max_num_points,
        )


class VoxelizedFrame(NamedTuple):
    """Fixed-shape voxelization result for one frame.

    Mirrors the reference's `(voxels, coors, num_points_per_voxel, voxel_num)`
    return (framework/voxel_generator.py:66-79 `VoxelGenerator_trt.generate`),
    padded to `max_voxels`; `coors` rows of unused slots are -1 so downstream
    scatters drop them.
    """

    voxels: jax.Array            # (max_voxels, max_num_points, C) float32
    coors: jax.Array             # (max_voxels, 3) int32; -1 on empty slots
    num_points_per_voxel: jax.Array  # (max_voxels,) int32
    voxel_num: jax.Array         # () int32


def point_cell_coords(points: jax.Array, spec: VoxelizerSpec):
    """Per-point integer cell coordinate and validity.

    Matches the floor-divide binning of the reference kernel
    (voxel_generator.py:89-92)."""
    voxel_size = jnp.asarray(spec.voxel_size, jnp.float32)
    offset = jnp.asarray(spec.offset, jnp.float32)
    grid = jnp.asarray(spec.grid_size, jnp.int32)
    coor = jnp.floor((points[:, :3] - offset) / voxel_size).astype(jnp.int32)
    inside = jnp.all((coor >= 0) & (coor < grid), axis=-1)
    return coor, inside


def _suffix_min_2level(a: jax.Array, n: int) -> jax.Array:
    """Suffix-min (reverse cummin) of a 1D int32 array via a 2-level
    row/column decomposition.

    XLA's 1D cummin over 120k elements lowers to ~17 unaligned shifted-min
    passes and measured ~0.7 ms; reshaping to (R, 512) makes every pass a
    full-tile op (in-row reverse cummin + a tiny cross-row suffix)."""
    cdim = 512
    big = jnp.iinfo(a.dtype).max
    r = (n + cdim - 1) // cdim
    pad = r * cdim - n
    a2 = jnp.concatenate([a, jnp.full((pad,), big, a.dtype)]).reshape(r, cdim)
    in_row = jax.lax.cummin(a2, axis=1, reverse=True)          # (r, cdim)
    row_min = in_row[:, 0]                                     # (r,)
    rows_after = jnp.concatenate(
        [jax.lax.cummin(row_min, axis=0, reverse=True)[1:], jnp.full((1,), big, a.dtype)]
    )                                                          # (r,)
    out = jnp.minimum(in_row, rows_after[:, None])
    return out.reshape(-1)[:n]


class FcfsSegments(NamedTuple):
    """Sorted segment structure behind the dense voxelizer: the carried
    grouping sort plus per-slot windows `[headpos[s], headpos[s]+counts[s])`
    into `spoints`, with slots in reference first-come-first-serve order."""

    spoints: jax.Array      # (n, c) points sorted by cell id (stable)
    headpos: jax.Array      # (max_voxels,) sorted-array row of each slot's head
    counts: jax.Array       # (max_voxels,) int32 points per slot (≤ max_num_points)
    coors: jax.Array        # (max_voxels, 3) int32; -1 on empty slots
    voxel_num: jax.Array    # () int32
    valid_slot: jax.Array   # (max_voxels,) bool


def fcfs_segments(
    points: jax.Array,
    num_points: jax.Array,
    spec: VoxelizerSpec,
) -> FcfsSegments:
    """Group points into per-pillar segments of the sorted array.

    The heavy machinery of the fcfs voxelizer (everything except the final
    dense `(V, P, C)` window gather): one stable carried sort groups points
    by cell, a second small sort yields first-occurrence slot order, and a
    2-level suffix-min scan bounds each slot's segment."""
    n, c = points.shape
    nx, ny, nz = spec.grid_size
    num_cells = nx * ny * nz

    coor, inside = point_cell_coords(points, spec)
    rank = jnp.arange(n, dtype=jnp.int32)
    valid = inside & (rank < num_points)

    cell_id = coor[:, 0] * (ny * nz) + coor[:, 1] * nz + coor[:, 2]
    cell_id = jnp.where(valid, cell_id, num_cells)  # sentinel sorts last

    # --- stable grouping sort, CARRYING the point data ----------------
    # Sorting the coordinate columns alongside the key moves the data
    # inside the sort network; the explicit 120k-row `points[order]`
    # gather it replaces cost ~0.8 ms (rows of 16 B are latency-bound,
    # sort passes are streaming).
    cols = tuple(points[:, i] for i in range(c))
    sorted_ops = jax.lax.sort(
        (cell_id,) + cols + (rank,), num_keys=1, is_stable=True
    )
    sid = sorted_ops[0]
    spoints = jnp.stack(sorted_ops[1 : 1 + c], axis=1)   # (n, c) sorted
    order = sorted_ops[-1]                                # original index
    svalid = sid < num_cells

    prev = jnp.concatenate([jnp.full((1,), -1, sid.dtype), sid[:-1]])
    head = (sid != prev) & svalid                # first point of each pillar
    pos = jnp.arange(n, dtype=jnp.int32)
    voxel_num = jnp.minimum(jnp.sum(head.astype(jnp.int32)), spec.max_voxels)

    # fcfs slot order via a SECOND small sort: heads keyed by their
    # original arrival index sort to the front in first-occurrence
    # order, and the carried `pos` is exactly headpos[s]. (Replaces a
    # scatter + 1D cumsum + scatter chain that cost ~1.5 ms: XLA's 1D
    # scans/scatters on 120k elements are lane-hostile.)
    head_key = jnp.where(head, order, n)
    _, headpos_all = jax.lax.sort((head_key, pos), num_keys=1)
    headpos = headpos_all[: spec.max_voxels]
    slot_ids = jnp.arange(spec.max_voxels, dtype=jnp.int32)
    valid_slot = slot_ids < voxel_num

    # exclusive suffix-min of head positions → end of each head's segment
    # (clamped to the valid-point count: invalid sentinel points sort
    # last and must not extend the final pillar's segment)
    total_valid = jnp.sum(svalid.astype(jnp.int32))
    arr = jnp.where(head, pos, n)
    suffix_min = _suffix_min_2level(arr, n)
    seg_end = jnp.minimum(
        jnp.concatenate([suffix_min[1:], jnp.full((1,), n, jnp.int32)])[headpos],
        total_valid,
    )
    counts = jnp.where(
        valid_slot,
        jnp.minimum(seg_end - headpos, spec.max_num_points),
        0,
    ).astype(jnp.int32)

    # coors derived arithmetically from the sorted cell id (bit-exact,
    # no gathered coordinate columns needed)
    sid_slot = sid[headpos]
    cx = sid_slot // (ny * nz)
    rem = sid_slot % (ny * nz)
    coors = jnp.where(
        valid_slot[:, None],
        jnp.stack([cx, rem // nz, rem % nz], axis=1),
        -1,
    ).astype(jnp.int32)

    return FcfsSegments(spoints, headpos, counts, coors, voxel_num, valid_slot)


def voxelize(
    points: jax.Array,
    num_points: jax.Array,
    spec: VoxelizerSpec,
    *,
    fcfs: bool = True,
) -> VoxelizedFrame:
    """Bin a padded point cloud into dense pillar buffers, on device.

    Args:
      points: (max_points, C) float32, rows beyond `num_points` are padding.
      num_points: () int32 true point count.
      spec: static voxelization parameters.
      fcfs: assign pillar slots in first-occurrence order (reference-identical
        pillar selection under the `max_voxels` cap) at the cost of one extra
        argsort; with `fcfs=False` slots follow cell-id order.
    """
    n, c = points.shape
    nx, ny, nz = spec.grid_size
    num_cells = nx * ny * nz

    if fcfs:
        seg = fcfs_segments(points, num_points, spec)
        headpos, counts, valid_slot = seg.headpos, seg.counts, seg.valid_slot

        # voxels: segments are consecutive in the sorted order, so slot s's
        # points are rows [headpos[s], headpos[s]+P) of spoints. Row gathers
        # on TPU are DESCRIPTOR-bound, not byte-bound: the plain
        # `spoints[headpos[:,None]+arange(P)]` form issues V·P independent
        # 16 B-row descriptors (0.61 ms at 20 cm), and a slice-sized
        # `lax.gather` (slice_sizes=(P, C)) lowers to a SERIAL while loop
        # (~25 ms — measured round 5; same trap as vmapped dynamic_slice).
        # Grouped form: view the sorted array as (n/G, G·C) so ONE descriptor
        # fetches G=8 consecutive rows (128 B), gather the ⌈(P+G−1)/G⌉+1
        # group-rows covering any P-window, then realign by headpos%G with a
        # G-way select — G× fewer descriptors for ~(G·nrow/P)× the bytes.
        G = 8
        nrow = -(-(G - 1 + spec.max_num_points) // G)  # covers r+P-1 ≤ (G-1)+P-1
        tail = (-n) % G  # pad n to a multiple of G before the group reshape
        spad = jnp.concatenate(
            [seg.spoints, jnp.zeros((tail + G * nrow, c), seg.spoints.dtype)]
        )
        wide = spad.reshape(-1, G * c)                # (n/G + nrow, G·C)
        q = headpos // G
        r = headpos % G
        grp = wide[q[:, None] + jnp.arange(nrow, dtype=jnp.int32)[None, :]]
        # realign on the FLAT lane axis: (V, nrow·G·C) keeps all lanes busy;
        # the (V, nrow·G, C) form ran the selects at C=4/128 lane occupancy
        # and cost 2.6 ms (measured round 5) vs 0.3 ms for the gather itself
        winf = grp.reshape(spec.max_voxels, nrow * G * c)
        pc = spec.max_num_points * c
        voxf = winf[:, 0:pc]
        for k in range(1, G):
            voxf = jnp.where((r == k)[:, None], winf[:, k * c : k * c + pc], voxf)
        slot_valid = (
            valid_slot[:, None]
            & (jnp.arange(spec.max_num_points, dtype=jnp.int32)[None, :] < counts[:, None])
        )
        voxels = jnp.where(
            slot_valid[..., None],
            voxf.reshape(spec.max_voxels, spec.max_num_points, c),
            0.0,
        )
        return VoxelizedFrame(voxels, seg.coors, counts, seg.voxel_num)

    coor, inside = point_cell_coords(points, spec)
    rank = jnp.arange(n, dtype=jnp.int32)
    valid = inside & (rank < num_points)

    cell_id = coor[:, 0] * (ny * nz) + coor[:, 1] * nz + coor[:, 2]
    cell_id = jnp.where(valid, cell_id, num_cells)  # sentinel sorts last

    # --- cell-id-ordered slots (fcfs=False): original sort + scatters -----
    order = jnp.argsort(cell_id, stable=True)          # (n,) original index per sorted pos
    sid = cell_id[order]                                # sorted cell ids
    spoints = points[order]
    scoor = coor[order]
    svalid = sid < num_cells

    # --- segment structure via scans (no scatter) -----------------------
    prev = jnp.concatenate([jnp.full((1,), -1, sid.dtype), sid[:-1]])
    head = (sid != prev) & svalid                       # first point of each pillar
    pos = jnp.arange(n, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(head, pos, -1))  # start index of my pillar
    pos_in_voxel = pos - seg_start                      # arrival slot within pillar

    # pillar index in cell-id order
    seg_idx = jnp.cumsum(head.astype(jnp.int32)) - 1    # (n,), -1 before first head
    voxel_num_total = jnp.sum(head.astype(jnp.int32))

    voxel_num = jnp.minimum(voxel_num_total, spec.max_voxels)

    # cell-id-ordered slots (fcfs=False): scatter formulation.
    # NB: `mode="drop"` only drops indices beyond the upper bound — negative
    # indices wrap numpy-style — so dropped rows use a positive OOB sentinel.
    voxel_slot = seg_idx
    keep = svalid & (voxel_slot < spec.max_voxels) & (pos_in_voxel < spec.max_num_points)
    oob_flat = spec.max_voxels * spec.max_num_points
    flat_idx = jnp.where(keep, voxel_slot * spec.max_num_points + pos_in_voxel, oob_flat)
    voxels = (
        jnp.zeros((spec.max_voxels * spec.max_num_points, c), points.dtype)
        .at[flat_idx].set(spoints, mode="drop", unique_indices=True)
        .reshape(spec.max_voxels, spec.max_num_points, c)
    )

    head_keep = head & (voxel_slot < spec.max_voxels)
    coors = (
        jnp.full((spec.max_voxels, 3), -1, jnp.int32)
        .at[jnp.where(head_keep, voxel_slot, spec.max_voxels)]
        .set(scoor, mode="drop", unique_indices=True)
    )

    counts = (
        jnp.zeros((spec.max_voxels,), jnp.int32)
        .at[jnp.where(keep, voxel_slot, spec.max_voxels)]
        .add(1, mode="drop")
    )

    return VoxelizedFrame(voxels, coors, counts, voxel_num)
