"""Anchor grid generation and per-class bookkeeping (host-side, built once).

Counterpart of the reference's `AnchorAssigner.__init__`/`generate`
(reference: framework/anchor_assigner.py:220-320): per class, for each
(size, rotation) pair, a dense grid of box anchors over the feature map in
x-major/y-minor order, concatenated class-by-class into one flat anchor set
of 1.44 M anchors with per-class index ranges (`class_masks`).

The anchor ordering contract — [class][size][rot][x][y] — must match the
SharedHead output reshape (see models/pointpillars.py) and is covered by
tests/test_anchors.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from det3d_tpu.config import Config
from det3d_tpu.ops.anchor_mask import anchor_corner_cells


def _limit_period_np(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period


def _rbbox2d_to_near_bbox_np(rbboxes: np.ndarray) -> np.ndarray:
    """Numpy twin of ops.geometry.rbbox2d_to_near_bbox for init-time use
    (reference: framework/box_np_ops.py:308-320)."""
    rots = rbboxes[..., -1]
    cond = (np.abs(_limit_period_np(rots, 0.5, np.pi)) > np.pi / 4)[..., None]
    dims = np.where(cond, rbboxes[:, [3, 2]], rbboxes[:, [2, 3]])
    centers = rbboxes[:, :2]
    return np.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


@dataclasses.dataclass(frozen=True)
class AnchorSet:
    """The full flat anchor set plus per-class views."""

    anchors: np.ndarray            # (A, 7) float32  [x,y,z,l,w,h,yaw]
    anchors_bv: np.ndarray         # (A, 4) float32  nearest-axis minmax BEV boxes
    corner_cells: np.ndarray       # (A, 4) int32    SAT lookup cells
    matched_threshold: np.ndarray  # (A,) float32
    unmatched_threshold: np.ndarray  # (A,) float32
    class_ranges: dict             # name -> (start, end) into the flat set
    config_ranges: tuple           # ((start, fx, fy), ...) per (class,size,rot) grid
    mask_index_vectors: tuple | None  # separable SAT row/col vectors (see ops.anchor_mask)

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
    """Build the flat anchor set for all classes in config order."""
    anchors_list = []
    matched_list = []
    unmatched_list = []
    class_ranges: dict[str, tuple[int, int]] = {}
    start = 0

    config_ranges = []
    for spec in cfg.class_specs:
        cls_anchors = []
        for size in spec.sizes:
            strides = np.asarray(cfg.detection_range_diff, np.float32) / np.asarray(
                spec.feature_map_size, np.float32
            )
            for rotation in spec.rotations:
                cls_anchors.append(
                    _generate_one(size, rotation, spec.feature_map_size, strides, cfg.detection_offset)
                )
                config_ranges.append(
                    (start + sum(a.shape[0] for a in cls_anchors[:-1]),
                     int(spec.feature_map_size[0]), int(spec.feature_map_size[1]))
                )
        cls_anchors = np.concatenate(cls_anchors, axis=0)
        n = cls_anchors.shape[0]
        anchors_list.append(cls_anchors)
        matched_list.append(np.full(n, spec.matched_threshold, np.float32))
        unmatched_list.append(np.full(n, spec.unmatched_threshold, np.float32))
        class_ranges[spec.name] = (start, start + n)
        start += n

    anchors = np.concatenate(anchors_list, axis=0)
    anchors_bv = _rbbox2d_to_near_bbox_np(anchors[:, [0, 1, 3, 4, 6]])
    corner_cells = anchor_corner_cells(
        anchors_bv, cfg.voxel_size, cfg.detection_offset, cfg.grid_size
    )
    from det3d_tpu.ops.anchor_mask import separable_corner_index_vectors

    vectors = separable_corner_index_vectors(corner_cells, config_ranges)
    return AnchorSet(
        anchors=anchors,
        anchors_bv=anchors_bv,
        corner_cells=corner_cells,
        matched_threshold=np.concatenate(matched_list),
        unmatched_threshold=np.concatenate(unmatched_list),
        class_ranges=class_ranges,
        config_ranges=tuple(config_ranges),
        mask_index_vectors=tuple(vectors) if vectors is not None else None,
    )
