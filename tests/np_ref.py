"""Sequential numpy oracles for the on-device kernels.

These deliberately mirror the *algorithms* of the reference's numba/CUDA
kernels (cited per function) as straightforward sequential numpy, serving as
golden models for parity tests — the formalized version of the reference's
own `infer_v2/v3` numpy-vs-torch cross-checking pattern
(reference: framework/inference.py:308-356).
"""

from __future__ import annotations

import numpy as np


def voxelize_ref(points, voxel_size, offset, grid_size, max_voxels, max_num_points):
    """Sequential first-come-first-serve pillar binning.

    Oracle for ops/voxelize.py; algorithm of reference
    framework/voxel_generator.py:82-106."""
    voxel_size = np.asarray(voxel_size, np.float32)
    offset = np.asarray(offset, np.float32)
    grid_size = np.asarray(grid_size, np.int32)
    c = points.shape[-1]
    voxels = np.zeros((max_voxels, max_num_points, c), points.dtype)
    counts = np.zeros((max_voxels,), np.int32)
    coors = np.zeros((max_voxels, 3), np.int32)
    cell_to_idx = {}
    voxel_num = 0
    for i in range(points.shape[0]):
        coor = np.floor((points[i, :3] - offset) / voxel_size).astype(np.int32)
        if np.any(coor < 0) or np.any(coor >= grid_size):
            continue
        key = (int(coor[0]), int(coor[1]), int(coor[2]))
        if key not in cell_to_idx:
            if voxel_num >= max_voxels:
                break
            cell_to_idx[key] = voxel_num
            coors[voxel_num] = coor
            voxel_num += 1
        vi = cell_to_idx[key]
        if counts[vi] < max_num_points:
            voxels[vi, counts[vi]] = points[i]
            counts[vi] += 1
    return voxels[:voxel_num], coors[:voxel_num], counts[:voxel_num], voxel_num


def box_encode_ref(boxes, anchors):
    """Oracle for geometry.box_encode (framework/box_np_ops.py:366-382)."""
    xa, ya, za, la, wa, ha, ra = np.split(anchors.astype(np.float64), 7, axis=-1)
    xg, yg, zg, lg, wg, hg, rg = np.split(boxes.astype(np.float64), 7, axis=-1)
    diag = np.sqrt(la**2 + wa**2)
    return np.concatenate(
        [
            (xg - xa) / diag,
            (yg - ya) / diag,
            (zg - za) / ha,
            np.log(lg / la),
            np.log(wg / wa),
            np.log(hg / ha),
            rg - ra,
        ],
        axis=-1,
    )


def box_decode_ref(enc, anchors):
    """Oracle for geometry.box_decode (framework/box_np_ops.py:406-423),
    including the z-center in / z-bottom out shift."""
    xa, ya, za, la, wa, ha, ra = np.split(anchors.astype(np.float64), 7, axis=-1)
    xt, yt, zt, lt, wt, ht, rt = np.split(enc.astype(np.float64), 7, axis=-1)
    za = za + ha / 2
    diag = np.sqrt(la**2 + wa**2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    lg = np.exp(lt) * la
    wg = np.exp(wt) * wa
    hg = np.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    return np.concatenate([xg, yg, zg, lg, wg, hg, rg], axis=-1)


def iou_ref(boxes, query, eps=0.0):
    """Oracle for geometry.iou_matrix (framework/box_np_ops.py:334-363)."""
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k), boxes.dtype)
    for j in range(k):
        qa = (query[j, 2] - query[j, 0] + eps) * (query[j, 3] - query[j, 1] + eps)
        for i in range(n):
            iw = min(boxes[i, 2], query[j, 2]) - max(boxes[i, 0], query[j, 0]) + eps
            if iw > 0:
                ih = min(boxes[i, 3], query[j, 3]) - max(boxes[i, 1], query[j, 1]) + eps
                if ih > 0:
                    ua = (boxes[i, 2] - boxes[i, 0] + eps) * (boxes[i, 3] - boxes[i, 1] + eps) + qa - iw * ih
                    out[i, j] = iw * ih / ua
    return out


def nms_greedy_ref(boxes, scores, iou_threshold, post_max_size):
    """Oracle for ops/nms.py: sequential greedy NMS with the +1 pixel-
    convention IoU (framework/nms.py:105-150 algorithm, host edition)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for pos_i, oi in enumerate(order):
        if suppressed[oi]:
            continue
        keep.append(oi)
        a = boxes[oi]
        for oj in order[pos_i + 1:]:
            if suppressed[oj]:
                continue
            b = boxes[oj]
            w = max(min(a[2], b[2]) - max(a[0], b[0]) + 1.0, 0.0)
            h = max(min(a[3], b[3]) - max(a[1], b[1]) + 1.0, 0.0)
            inter = w * h
            sa = (a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0)
            sb = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0)
            if inter / (sa + sb - inter) > iou_threshold:
                suppressed[oj] = True
    return np.array(keep[:post_max_size], np.int64)


def sat_anchor_mask_ref(coors, grid_xy, corner_cells):
    """Oracle for ops/anchor_mask.py (framework/box_np_ops.py:159-257)."""
    occ = np.zeros(grid_xy, np.float32)
    for r in coors:
        if r[0] >= 0:
            occ[r[0], r[1]] += 1
    sat = occ.cumsum(0).cumsum(1)
    minx, miny, maxx, maxy = (corner_cells[:, i] for i in range(4))
    return (sat[maxx, maxy] - sat[maxx, miny] - sat[minx, maxy] + sat[minx, miny]) > 0


def _rbbox2d_to_near_bbox(rb):
    rots = rb[..., -1]
    rots_0_pi = np.abs(rots - np.floor(rots / np.pi + 0.5) * np.pi)
    cond = (rots_0_pi > np.pi / 4)[..., None]
    dims = np.where(cond, rb[:, [3, 2]], rb[:, [2, 3]])
    return np.concatenate([rb[:, :2] - dims / 2, rb[:, :2] + dims / 2], -1)


def assign_targets_ref(anchors, anchors_bv, anchors_mask, gt_boxes,
                       matched_threshold, unmatched_threshold):
    """Oracle for targets._assign_one_class: the reference's gather/unmap
    algorithm (framework/anchor_assigner.py:337-457) in sequential numpy."""
    num_anchors = anchors.shape[0]
    inds_inside = np.where(anchors_mask)[0]
    a = anchors[inds_inside]
    a_bv = anchors_bv[inds_inside]
    ni = len(inds_inside)
    labels = -np.ones((ni,), np.int32)
    bbox_targets = np.zeros((ni, 7), np.float32)

    if len(gt_boxes) > 0 and ni > 0:
        gt_bv = _rbbox2d_to_near_bbox(gt_boxes[:, [0, 1, 3, 4, 6]])
        overlap = iou_ref(a_bv.astype(np.float32), gt_bv.astype(np.float32))
        anchor_to_gt_argmax = overlap.argmax(1)
        anchor_to_gt_max = overlap[np.arange(ni), anchor_to_gt_argmax]
        gt_to_anchor_argmax = overlap.argmax(0)
        gt_to_anchor_max = overlap[gt_to_anchor_argmax, np.arange(overlap.shape[1])]
        gt_to_anchor_max[gt_to_anchor_max == 0] = -1
        anchors_with_max = np.where(overlap == gt_to_anchor_max)[0]
        labels[anchors_with_max] = 1
        pos = anchor_to_gt_max >= matched_threshold
        labels[pos] = 1
        labels[anchor_to_gt_max < unmatched_threshold] = 0
        labels[anchors_with_max] = 1
        fg = np.where(labels > 0)[0]
        bbox_targets[fg] = box_encode_ref(
            gt_boxes[anchor_to_gt_argmax[fg]], a[fg]
        ).astype(np.float32)
    else:
        labels[:] = 0

    weights = np.zeros((ni,), np.float32)
    weights[labels > 0] = 1.0

    def unmap(data, fill):
        out = np.full((num_anchors,) + data.shape[1:], fill, data.dtype)
        out[inds_inside] = data
        return out

    labels = unmap(labels, -1)
    bbox_targets = unmap(bbox_targets, 0)
    weights = unmap(weights, 0)
    dir_targets = ((bbox_targets[:, -1] + anchors[:, -1]) > 0).astype(np.int32)
    return labels, bbox_targets, weights, dir_targets


# ---------------------------------------------------------------------------
# rotated-box IoU oracle (Sutherland–Hodgman clip + shoelace)
# ---------------------------------------------------------------------------


def rbox_corners_ref(box):
    """[x, y, dx, dy, yaw] → (4, 2) corners in the *iou-kernel* convention
    (reference eval/iou.py:355-378: x = c·cx + s·cy, y = −s·cx + c·cy —
    the transpose of the box_np_ops corner rotation; the reference eval
    path compensates by passing −yaw, see eval/eval.py:252)."""
    x, y, dx, dy, yaw = box
    norm = np.array([[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]])
    corners = norm * np.array([dx, dy])
    s, c = np.sin(yaw), np.cos(yaw)
    rot = np.array([[c, -s], [s, c]])
    return corners @ rot + np.array([x, y])


def _clip_polygon(poly, a, b):
    """Sutherland–Hodgman step: keep the left side of directed edge a→b
    (clip polygon must be CCW)."""
    out = []
    n = len(poly)
    for i in range(n):
        p, q = np.asarray(poly[i]), np.asarray(poly[(i + 1) % n])
        sp = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        sq = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
        if sp >= 0:
            out.append(p)
        if (sp > 0 and sq < 0) or (sp < 0 and sq > 0):
            t = sp / (sp - sq)
            out.append(p + t * (q - p))
    return out


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    a = 0.0
    for i in range(len(poly)):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % len(poly)]
        a += x1 * y2 - x2 * y1
    return abs(a) / 2


def _ccw(poly):
    a = 0.0
    for i in range(len(poly)):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % len(poly)]
        a += x1 * y2 - x2 * y1
    return poly if a > 0 else poly[::-1]


def rotated_intersection_ref(box_a, box_b):
    """Exact intersection area of two rotated BEV boxes."""
    pa = [p for p in _ccw(rbox_corners_ref(box_a))]
    pb = _ccw(rbox_corners_ref(box_b))
    poly = pa
    for i in range(4):
        poly = _clip_polygon(poly, pb[i], pb[(i + 1) % 4])
        if not poly:
            return 0.0
    return _poly_area(poly)


def rotated_iou_ref(boxes, qboxes, criterion=-1):
    """(N, 5) x (K, 5) rotated IoU matrix; criterion -1 = IoU, 0/1 = inter
    over area of first/second (reference eval/iou.py devRotateIoUEval)."""
    n, k = len(boxes), len(qboxes)
    out = np.zeros((n, k))
    for i in range(n):
        for j in range(k):
            inter = rotated_intersection_ref(boxes[i], qboxes[j])
            area_a = boxes[i, 2] * boxes[i, 3]
            area_b = qboxes[j, 2] * qboxes[j, 3]
            if criterion == -1:
                denom = area_a + area_b - inter
            elif criterion == 0:
                denom = area_a
            else:
                denom = area_b
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out
