"""On-device anchor target assignment (vectorized, static shapes).

TPU-native counterpart of `AnchorAssigner.assign` (reference:
framework/anchor_assigner.py:337-457), which runs per-frame on the CPU inside
dataloader workers using numba `iou_jit`. Here the whole assignment — per
class: nearest-axis BEV IoU against gt, bidirectional argmax, force-matching
of each gt's best anchors (including ties), thresholding to labels
{-1, 0, 1}, regression encoding, and direction targets — is dense masked
`jnp` that traces into the training step.

Semantics mapping (dynamic gather → dense mask):
  * the reference first gathers `inds_inside = where(anchors_mask)` and
    assigns only those, then `unmap`s back with fill -1/0
    (anchor_assigner.py:353-412). Dense equivalent: excluded anchors get
    IoU rows of -1 (never selected, never force-matched) and final
    label -1 / target 0 / weight 0;
  * gt padding columns get IoU -1, so with zero valid gt every included
    anchor's best IoU is -1 < unmatched_threshold → label 0, matching the
    reference's `labels[:] = 0` empty-gt branch (:399-400);
  * a gt whose best overlap is exactly 0 force-matches nothing
    (`empty_gt_mask` fix, :374-375) — reproduced by requiring
    `gt_to_anchor_max > 0` for force matches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from det3d_tpu.anchors import AnchorSet
from det3d_tpu.config import Config
from det3d_tpu.ops import geometry


class TargetAssignment(NamedTuple):
    """Spatial anchor-major target maps (the preds contract's form): the
    anchor axes are (nch, fx, fy) with the spatial dims minor, so the loss's
    million-anchor elementwise math runs lane-efficiently against the head's
    own (N, k, nch, fx, fy) output layout — no flat-form relayout exists on
    either side. Row-major flatten recovers the legacy (A,) flat order."""

    labels: jax.Array            # (nch, fx, fy) int32 in {-1, 0, 1}
    bbox_targets: jax.Array      # (7, nch, fx, fy) float32 — channel-major:
    # both the assigner's encode and the loss's smooth-L1 operate
    # lane-efficiently in this orientation (never round-trips through (A, 7))
    bbox_outside_weights: jax.Array  # (nch, fx, fy) float32
    dir_targets: jax.Array       # (nch, fx, fy) int32 in {0, 1}


def _assign_one_class(
    anchors: jax.Array,           # (Ac, 7)
    anchors_bv: jax.Array,        # (Ac, 4)
    anchors_mask: jax.Array,      # (Ac,) bool
    gt_boxes: jax.Array,          # (G, 7) padded
    gt_valid: jax.Array,          # (G,) bool (this class & real)
    matched_threshold: float,
    unmatched_threshold: float,
):
    gt_bv = geometry.rbbox2d_to_near_bbox(gt_boxes[:, jnp.array([0, 1, 3, 4, 6])])
    # (G, Ac) orientation: the anchor axis is minor, so the ~1M-wide
    # elementwise/reduce ops fill all 128 VPU lanes (the (Ac, G) orientation
    # wastes 2x+ on lane padding and dominated the train step)
    overlap = geometry.iou_matrix(gt_bv, anchors_bv, eps=0.0)        # (G, Ac)
    included = anchors_mask
    overlap = jnp.where(gt_valid[:, None] & included[None, :], overlap, -1.0)
    # materialize once: XLA otherwise duplicates the IoU computation into
    # each consumer fusion (max/argmax/force-match), tripling its cost
    overlap = jax.lax.optimization_barrier(overlap)

    anchor_to_gt_argmax = jnp.argmax(overlap, axis=0)                # (Ac,)
    anchor_to_gt_max = jnp.max(overlap, axis=0)

    gt_to_anchor_max = jnp.max(overlap, axis=1)                      # (G,)
    # gts with zero best overlap must not force-match (reference :374-375)
    force = (
        (overlap == gt_to_anchor_max[:, None])
        & (gt_to_anchor_max[:, None] > 0)
        & gt_valid[:, None]
        & included[None, :]
    )
    force_any = jnp.any(force, axis=0)                               # (Ac,)

    pos = anchor_to_gt_max >= matched_threshold
    bg = anchor_to_gt_max < unmatched_threshold
    labels = jnp.where(
        force_any | pos, 1, jnp.where(bg, 0, -1)
    ).astype(jnp.int32)
    labels = jnp.where(included, labels, -1)

    # channel-major encode: (7, G) gt table gathered per anchor keeps the
    # Ac-wide elementwise ops on full lanes (see box_encode_transposed)
    gt_t = gt_boxes.T                                                # (7, G)
    matched_gt_t = gt_t[:, anchor_to_gt_argmax]                      # (7, Ac)
    encoded_t = geometry.box_encode_transposed(matched_gt_t, anchors.T)
    fg = labels > 0
    bbox_targets_t = jnp.where(fg[None, :], encoded_t, 0.0)          # (7, Ac)
    weights = fg.astype(jnp.float32)

    # direction target from the (possibly zero-filled) regression target,
    # exactly as reference get_direction_target (:454-457)
    rot_gt = bbox_targets_t[-1] + anchors[:, -1]
    dir_targets = (rot_gt > 0).astype(jnp.int32)
    return labels, bbox_targets_t, weights, dir_targets


def make_target_assigner(cfg: Config, anchor_set: AnchorSet, use_pallas: bool | None = None):
    """Build a jit-able `fn(gt_boxes, gt_classes, gt_valid, anchors_mask)`.

    gt arrays are padded to `cfg.max_gt_boxes`; `gt_classes` uses 1-based ids
    in `cfg.class_specs` order (reference: framework/dataset.py:114).
    Padded gt rows must have nonzero dims (host pads with dims=1) so the
    masked `box_encode` log terms stay finite.

    `use_pallas`: route the per-class assignment through the fused
    matrix-free Pallas matcher (kernels/matcher_pallas.py) instead of the
    dense-IoU XLA path; default on TPU. Results are elementwise identical
    (tests/test_targets.py::TestPallasMatcher).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    nch = anchor_set.num_channels
    channels = [anchor_set.class_channels[s.name] for s in cfg.class_specs]
    class_anchors = [
        jnp.asarray(anchor_set.anchors_by_class[s.name]) for s in cfg.class_specs
    ]
    class_anchors_bv = [
        jnp.asarray(anchor_set.anchors_bv_by_class[s.name]) for s in cfg.class_specs
    ]
    thresholds = [(s.matched_threshold, s.unmatched_threshold) for s in cfg.class_specs]

    def assign(
        gt_boxes: jax.Array,      # (G, 7)
        gt_classes: jax.Array,    # (G,) int32, 1-based
        gt_valid: jax.Array,      # (G,) bool
        anchors_mask: jax.Array,  # (nch, fx, fy) bool, spatial anchor-major
    ) -> TargetAssignment:
        # anchor-major layout: per-class anchors are contiguous channel
        # ranges, so per-class masks are row slices and the per-class results
        # concatenate directly along the channel axis — no reinterleave
        fx, fy = anchors_mask.shape[1], anchors_mask.shape[2]
        labels_l, targets_l, weights_l, dir_l = [], [], [], []
        for ci, ((c0, c1), anchors, anchors_bv, (mth, uth)) in enumerate(
            zip(channels, class_anchors, class_anchors_bv, thresholds)
        ):
            cls_valid = gt_valid & (gt_classes == ci + 1)
            if use_pallas:
                from det3d_tpu.kernels.matcher_pallas import assign_class_pallas

                lab, tgt, w, d = assign_class_pallas(
                    anchors, anchors_bv, anchors_mask[c0:c1].reshape(-1),
                    gt_boxes, cls_valid, mth, uth
                )
            else:
                lab, tgt, w, d = _assign_one_class(
                    anchors, anchors_bv, anchors_mask[c0:c1].reshape(-1),
                    gt_boxes, cls_valid, mth, uth
                )
            cch = c1 - c0
            labels_l.append(lab.reshape(cch, fx, fy))
            targets_l.append(tgt.reshape(7, cch, fx, fy))
            weights_l.append(w.reshape(cch, fx, fy))
            dir_l.append(d.reshape(cch, fx, fy))
        return TargetAssignment(
            labels=jnp.concatenate(labels_l),
            bbox_targets=jnp.concatenate(targets_l, axis=1),
            bbox_outside_weights=jnp.concatenate(weights_l),
            dir_targets=jnp.concatenate(dir_l),
        )

    return assign


def pad_gt(
    cfg: Config, gt_boxes: np.ndarray, gt_classes: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host helper: pad variable gt to (max_gt_boxes, ...) static shapes."""
    g = cfg.max_gt_boxes
    n = min(gt_boxes.shape[0], g)
    boxes = np.zeros((g, 7), np.float32)
    boxes[:, 3:6] = 1.0  # keep masked log terms finite
    classes = np.zeros((g,), np.int32)
    valid = np.zeros((g,), bool)
    boxes[:n] = gt_boxes[:n]
    classes[:n] = gt_classes[:n]
    valid[:n] = True
    return boxes, classes, valid
