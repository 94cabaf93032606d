"""Pallas TPU kernel: fused anchor-target matcher (matrix-free).

TPU-native replacement for the dense-IoU target assignment path
(targets._assign_one_class, itself the counterpart of the reference's
numba `AnchorAssigner.assign`, reference: framework/anchor_assigner.py:337-457).

The XLA path materializes the (G, Ac) IoU matrix to HBM (≈ 64×960k×4 B for
vehicles) because max / argmax / force-match each consume it; that
materialization plus the (7, Ac) gather-encode measured ~27 ms of a
~167 ms train step. Here the matrix never exists: two passes over anchor
tiles recompute the IoU rows in VMEM,

  pass 1: per-gt running max over all anchor tiles → (G,) `gt_max`;
  pass 2 (per tile, all fused):
    - IoU rows (G, T) on the VPU,
    - per-anchor max/argmax over the G sublanes,
    - force-match ties: any(ov == gt_max & gt_max > 0) — exact reference
      tie semantics (anchor_assigner.py:362-398) since both passes compute
      bit-identical elementwise IoU,
    - labels {-1, 0, 1} with per-class thresholds (static),
    - regression encode: matched gt gathered as a one-hot (7,G)x(G,T)
      matmul on the MXU, then box_encode_transposed math elementwise,
    - direction target from the zero-filled yaw target (reference
      get_direction_target, :454-457).

Outputs are channel-major (7, Ac) bbox targets + (Ac,) labels/weights/dir,
identical to targets._assign_one_class (tests/test_targets.py compares the
two paths elementwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iou_rows(abv_ref, gt_bv_ref, gt_valid_ref, mask_ref):
    """(G, T) IoU of gt BEV boxes vs this anchor tile; excluded pairs → -1.

    Same math as ops.geometry.iou_matrix with eps=0 (reference
    framework/box_np_ops.py:334-363)."""
    x1a = abv_ref[0:1, :]  # (1, T)
    y1a = abv_ref[1:2, :]
    x2a = abv_ref[2:3, :]
    y2a = abv_ref[3:4, :]
    x1g = gt_bv_ref[:, 0:1]  # (G, 1)
    y1g = gt_bv_ref[:, 1:2]
    x2g = gt_bv_ref[:, 2:3]
    y2g = gt_bv_ref[:, 3:4]

    iw = jnp.minimum(x2a, x2g) - jnp.maximum(x1a, x1g)
    ih = jnp.minimum(y2a, y2g) - jnp.maximum(y1a, y1g)
    inter = jnp.where((iw > 0) & (ih > 0), iw * ih, 0.0)
    area_a = (x2a - x1a) * (y2a - y1a)
    area_g = (x2g - x1g) * (y2g - y1g)
    union = area_a + area_g - inter
    ov = jnp.where(inter > 0, inter / union, 0.0)
    included = (gt_valid_ref[:, 0:1] > 0) & (mask_ref[0:1, :] > 0)
    return jnp.where(included, ov, -1.0)


def _gt_max_kernel(abv_ref, mask_ref, gt_bv_ref, gt_valid_ref, gmax_ref):
    ov = _iou_rows(abv_ref, gt_bv_ref, gt_valid_ref, mask_ref)
    tile_max = jnp.max(ov, axis=1, keepdims=True)  # (G, 1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        gmax_ref[:] = tile_max

    @pl.when(pl.program_id(0) != 0)
    def _():
        gmax_ref[:] = jnp.maximum(gmax_ref[:], tile_max)


def _assign_tile(
    abv_ref, a_ref, mask_ref, gt_bv_ref, gt_t_ref, gt_valid_ref, gmax_ref,
    labels_ref, targets_ref, weights_ref, dir_ref,
    matched_threshold: float, unmatched_threshold: float,
):
    ov = _iou_rows(abv_ref, gt_bv_ref, gt_valid_ref, mask_ref)  # (G, T)

    amax = jnp.max(ov, axis=0, keepdims=True)          # (1, T)
    argmax = jnp.argmax(ov, axis=0)[None, :]           # (1, T) int32

    gmax = gmax_ref[:]                                  # (G, 1)
    force = jnp.any((ov == gmax) & (gmax > 0), axis=0, keepdims=True)  # (1, T)

    included = mask_ref[0:1, :] > 0
    pos = force | (amax >= matched_threshold)
    bg = amax < unmatched_threshold
    labels = jnp.where(pos, 1, jnp.where(bg, 0, -1))
    labels = jnp.where(included, labels, -1)
    fg = labels > 0

    # matched gt per anchor: one-hot (G, T) x (7, G) on the MXU — exact
    # (one nonzero term per column)
    g = gt_t_ref.shape[1]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, ov.shape, 0) == argmax
    ).astype(jnp.float32)
    matched = jax.lax.dot_general(
        gt_t_ref[:], onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (7, T)

    # box_encode_transposed (reference framework/box_np_ops.py:366-382)
    xa, ya, za = a_ref[0:1, :], a_ref[1:2, :], a_ref[2:3, :]
    la, wa, ha = a_ref[3:4, :], a_ref[4:5, :], a_ref[5:6, :]
    ra = a_ref[6:7, :]
    xg, yg, zg = matched[0:1, :], matched[1:2, :], matched[2:3, :]
    lg, wg, hg = matched[3:4, :], matched[4:5, :], matched[5:6, :]
    rg = matched[6:7, :]
    diagonal = jnp.sqrt(la * la + wa * wa)
    encoded = jnp.concatenate(
        [
            (xg - xa) / diagonal,
            (yg - ya) / diagonal,
            (zg - za) / ha,
            jnp.log(lg / la),
            jnp.log(wg / wa),
            jnp.log(hg / ha),
            rg - ra,
        ],
        axis=0,
    )  # (7, T)
    targets = jnp.where(fg, encoded, 0.0)

    labels_ref[:] = labels.astype(jnp.int32)
    targets_ref[:] = targets
    weights_ref[:] = fg.astype(jnp.float32)
    dir_ref[:] = ((targets[6:7, :] + ra) > 0).astype(jnp.int32)


def _assign_kernel(
    abv_ref, a_ref, mask_ref, gt_bv_ref, gt_t_ref, gt_valid_ref, gmax_ref,
    labels_ref, targets_ref, weights_ref, dir_ref,
    *, matched_threshold: float, unmatched_threshold: float,
):
    _assign_tile(
        abv_ref, a_ref, mask_ref, gt_bv_ref, gt_t_ref, gt_valid_ref, gmax_ref,
        labels_ref, targets_ref, weights_ref, dir_ref,
        matched_threshold, unmatched_threshold,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("matched_threshold", "unmatched_threshold", "interpret"),
)
def assign_class_pallas(
    anchors: jax.Array,        # (Ac, 7) f32
    anchors_bv: jax.Array,     # (Ac, 4) f32
    anchors_mask: jax.Array,   # (Ac,) bool
    gt_boxes: jax.Array,       # (G, 7) f32 padded
    gt_valid: jax.Array,       # (G,) bool
    matched_threshold: float,
    unmatched_threshold: float,
    interpret: bool = False,
):
    """Fused one-class assignment. Returns (labels, bbox_targets_t, weights,
    dir_targets) exactly like targets._assign_one_class.

    (A round-3 tile-skipping variant that branched on scalar-prefetched
    per-tile occupancy was measured on-chip as a no-win — BASELINE.md
    "Round-3 final lever A/Bs" — and removed.)"""
    ac = anchors.shape[0]
    g = gt_boxes.shape[0]
    tile = 3200 if ac >= 3200 else _round_up(ac, 256)
    ac_pad = _round_up(ac, tile)
    grid = ac_pad // tile

    a_t = jnp.zeros((7, ac_pad), jnp.float32).at[:, :ac].set(anchors.T)
    # padded anchors: unit dims keep log/div finite; mask 0 excludes them
    a_t = a_t.at[3:6, ac:].set(1.0)
    abv_t = jnp.zeros((4, ac_pad), jnp.float32).at[:, :ac].set(anchors_bv.T)
    mask_f = (
        jnp.zeros((1, ac_pad), jnp.float32)
        .at[:, :ac]
        .set(anchors_mask.astype(jnp.float32))
    )
    gt_bv = jnp.asarray(
        # nearest-axis standup boxes of the gt (reference similarity_fn)
        _gt_near_bbox(gt_boxes), jnp.float32
    )
    gt_t = gt_boxes.T.astype(jnp.float32)                      # (7, G)
    gt_valid_f = gt_valid.astype(jnp.float32)[:, None]         # (G, 1)

    gt_specs = [
        pl.BlockSpec((g, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    gmax_in = [abv_t, mask_f, gt_bv, gt_valid_f]
    gmax_in_specs = [
        pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        *gt_specs,
    ]
    gmax_out_spec = pl.BlockSpec((g, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    gmax = pl.pallas_call(
        _gt_max_kernel,
        grid=(grid,),
        in_specs=gmax_in_specs,
        out_specs=gmax_out_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1), jnp.float32),
        interpret=interpret,
    )(*gmax_in)

    assign_in = [abv_t, a_t, mask_f, gt_bv, gt_t, gt_valid_f, gmax]
    assign_out_shape = [
        jax.ShapeDtypeStruct((1, ac_pad), jnp.int32),
        jax.ShapeDtypeStruct((7, ac_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, ac_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, ac_pad), jnp.int32),
    ]
    kernel = functools.partial(
        _assign_kernel,
        matched_threshold=matched_threshold,
        unmatched_threshold=unmatched_threshold,
    )
    labels, targets_t, weights, dirs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            gt_specs[0],
            pl.BlockSpec((7, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            gt_specs[1],
            pl.BlockSpec((g, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=assign_out_shape,
        interpret=interpret,
    )(*assign_in)

    return (
        labels[0, :ac],
        targets_t[:, :ac],
        weights[0, :ac],
        dirs[0, :ac],
    )


def _gt_near_bbox(gt_boxes: jax.Array) -> jax.Array:
    """rbbox2d_to_near_bbox of the gt boxes' BEV footprint (jnp twin of
    ops.geometry.rbbox2d_to_near_bbox, reference box_np_ops.py:308-320)."""
    from det3d_tpu.ops import geometry

    return geometry.rbbox2d_to_near_bbox(
        gt_boxes[:, jnp.array([0, 1, 3, 4, 6])]
    )
