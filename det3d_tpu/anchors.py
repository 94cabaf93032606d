"""Anchor grid generation and per-class bookkeeping (host-side, built once).

Counterpart of the reference's `AnchorAssigner.__init__`/`generate`
(reference: framework/anchor_assigner.py:220-320): per class, for each
(size, rotation) pair, a dense grid of box anchors over the feature map in
x-major/y-minor order, concatenated class-by-class into one flat anchor set
of 1.44 M anchors with per-class index ranges (`class_masks`).

The per-location channel ordering contract — [class][size][rot] — must match
the SharedHead output reshape (see models/pointpillars.py); golden tests at
the production 400x400 geometry live in tests/test_anchors.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from det3d_tpu.utils.npmath import limit_period_np

from det3d_tpu.config import Config
from det3d_tpu.ops.anchor_mask import anchor_corner_cells


def _rbbox2d_to_near_bbox_np(rbboxes: np.ndarray) -> np.ndarray:
    """Numpy twin of ops.geometry.rbbox2d_to_near_bbox for init-time use
    (reference: framework/box_np_ops.py:308-320)."""
    rots = rbboxes[..., -1]
    cond = (np.abs(limit_period_np(rots, 0.5, np.pi)) > np.pi / 4)[..., None]
    dims = np.where(cond, rbboxes[:, [3, 2]], rbboxes[:, [2, 3]])
    centers = rbboxes[:, :2]
    return np.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


@dataclasses.dataclass(frozen=True)
class AnchorSet:
    """The full flat anchor set plus per-class views.

    Flat layout is **anchor-major**: flat = channel·(fx·fy) + (x·fy + y),
    where `channel` indexes the A per-location anchor configs, classes in
    config order ([class][size][rot][x][y]) — the reference's exact ordering
    (framework/anchor_assigner.py:284-298). Round 1 used a location-major
    layout to suit a k-minor NHWC head reshape; since then every consumer
    went channel-major ((k, A) preds, (7, A) targets, per-channel mask
    vectors), and with the head emitted as one (90, HW) dot_general the
    anchor-major order makes every layout hop a pure reshape: per-class
    slices are contiguous ROW ranges, and the per-class "tables" are views,
    not copies.
    """

    anchors: np.ndarray            # (A, 7) float32  [x,y,z,l,w,h,yaw]
    anchors_bv: np.ndarray         # (A, 4) float32  nearest-axis minmax BEV boxes
    corner_cells: np.ndarray       # (A, 4) int32    SAT lookup cells
    matched_threshold: np.ndarray  # (A,) float32
    unmatched_threshold: np.ndarray  # (A,) float32
    grid_hw: tuple                 # (fx, fy) shared feature-map grid
    num_channels: int              # A per location (9 for the default specs)
    class_channels: dict           # name -> (c0, c1) channel range per class
    anchors_by_class: dict         # name -> (fx*fy*(c1-c0), 7) contiguous copy
    anchors_bv_by_class: dict      # name -> (fx*fy*(c1-c0), 4) contiguous copy
    mask_index_vectors: tuple | None  # separable SAT row/col vectors per channel

    @property
    def num_anchors(self) -> int:
        return self.anchors.shape[0]


def _generate_one(size, rotation, feature_map_size, strides, offsets) -> np.ndarray:
    """One (size, rotation) anchor grid, x-major (meshgrid 'ij') order.

    Matches reference framework/anchor_assigner.py:300-320, including the
    z-offset override to half the anchor height (:303)."""
    fx, fy, fz = (int(v) for v in feature_map_size)
    x_stride, y_stride, z_stride = (float(s) for s in strides)
    x_off = float(offsets[0]) + x_stride / 2
    y_off = float(offsets[1]) + y_stride / 2
    z_off = float(size[2]) / 2  # anchors sit on the ground plane

    x_centers = np.arange(fx, dtype=np.float32) * x_stride + x_off
    y_centers = np.arange(fy, dtype=np.float32) * y_stride + y_off
    z_centers = np.arange(fz, dtype=np.float32) * z_stride + z_off

    xs, ys, zs = np.meshgrid(x_centers, y_centers, z_centers, indexing="ij")
    out = np.empty((fx, fy, fz, 7), np.float32)
    out[..., 0] = xs
    out[..., 1] = ys
    out[..., 2] = zs
    out[..., 3:6] = np.asarray(size, np.float32)
    out[..., 6] = float(rotation)
    return out.reshape(-1, 7)


def build_anchors(cfg: Config) -> AnchorSet:
    """Build the flat anchor set for all classes, anchor-major."""
    fx, fy, _ = cfg.class_specs[0].feature_map_size
    for spec in cfg.class_specs:
        assert tuple(spec.feature_map_size[:2]) == (fx, fy), (
            "the shared flat anchor layout requires one feature-map grid"
        )

    channel_grids = []   # per (class, size, rot): (fx*fy, 7) grid
    matched_ch, unmatched_ch = [], []
    class_channels: dict[str, tuple[int, int]] = {}
    for spec in cfg.class_specs:
        c0 = len(channel_grids)
        strides = np.asarray(cfg.detection_range_diff, np.float32) / np.asarray(
            spec.feature_map_size, np.float32
        )
        for size in spec.sizes:
            for rotation in spec.rotations:
                channel_grids.append(
                    _generate_one(size, rotation, spec.feature_map_size, strides, cfg.detection_offset)
                )
                matched_ch.append(spec.matched_threshold)
                unmatched_ch.append(spec.unmatched_threshold)
        class_channels[spec.name] = (c0, len(channel_grids))

    a = len(channel_grids)
    # anchor-major flat: channel blocks concatenated, each (fx·fy, 7)
    anchors = np.ascontiguousarray(np.concatenate(channel_grids, axis=0))
    anchors_bv = _rbbox2d_to_near_bbox_np(anchors[:, [0, 1, 3, 4, 6]])
    corner_cells = anchor_corner_cells(
        anchors_bv, cfg.voxel_size, cfg.detection_offset, cfg.grid_size
    )

    # per-class "tables" are contiguous row-range views in this layout
    hw = fx * fy
    anchors_by_class, anchors_bv_by_class = {}, {}
    for name, (c0, c1) in class_channels.items():
        anchors_by_class[name] = anchors[c0 * hw : c1 * hw]
        anchors_bv_by_class[name] = anchors_bv[c0 * hw : c1 * hw]

    from det3d_tpu.ops.anchor_mask import separable_corner_index_vectors

    vectors = separable_corner_index_vectors(corner_cells, (fx, fy), a)
    return AnchorSet(
        anchors=anchors,
        anchors_bv=anchors_bv,
        corner_cells=corner_cells,
        matched_threshold=np.repeat(
            np.asarray(matched_ch, np.float32), fx * fy
        ),
        unmatched_threshold=np.repeat(
            np.asarray(unmatched_ch, np.float32), fx * fy
        ),
        grid_hw=(fx, fy),
        num_channels=a,
        class_channels=class_channels,
        anchors_by_class=anchors_by_class,
        anchors_bv_by_class=anchors_bv_by_class,
        mask_index_vectors=tuple(vectors) if vectors is not None else None,
    )
