"""Rotated-box intersection / IoU, vectorized for TPU.

Replaces the reference's numba.cuda rotated-IoU kernel stack (reference:
eval/iou.py:164-399 device functions + rotate_iou_kernel_eval :603-638) with
fully-vectorized jnp over (N, K) box pairs:

  * corner generation with the reference's clockwise convention
    (rbbox_to_corners, iou.py:355-378);
  * candidate intersection vertices = corners-inside-other (projection test
    with inclusive bounds, point_in_quadrilateral iou.py:308-325) + all 16
    edge-pair intersections (line_segment_intersection iou.py:221-263);
  * vertices sorted by angle about their centroid, area via the same
    fan-triangulation-with-abs as the reference (area/sort_vertex…,
    iou.py:170-218) — for convex intersections any consistent cyclic order
    gives the identical area, so an atan2 sort replaces the pseudo-angle
    insertion sort.

`criterion` matches the reference: -1 → IoU, 0 → inter/area1, 1 →
inter/area2, 2 → raw intersection area (used by the 3D overlap composition,
eval/eval.py:226-230).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MAX_VERTS = 24  # 8 corner-in-box + 16 edge intersections


def rbbox_corners(rbboxes: jax.Array) -> jax.Array:
    """(..., 5)=[cx, cy, dx, dy, angle] → (..., 4, 2) clockwise corners,
    reference layout (eval/iou.py:355-378)."""
    angle = rbboxes[..., 4]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    dx = rbboxes[..., 2]
    dy = rbboxes[..., 3]
    cx_ = jnp.stack([-dx / 2, -dx / 2, dx / 2, dx / 2], axis=-1)
    cy_ = jnp.stack([-dy / 2, dy / 2, dy / 2, -dy / 2], axis=-1)
    x = c[..., None] * cx_ + s[..., None] * cy_ + rbboxes[..., None, 0]
    y = -s[..., None] * cx_ + c[..., None] * cy_ + rbboxes[..., None, 1]
    return jnp.stack([x, y], axis=-1)


def _point_in_quad(px, py, quad):
    """Inclusive projection test (reference point_in_quadrilateral,
    eval/iou.py:308-325). quad: (..., 4, 2); px/py broadcastable.

    Robustness divergence from the reference: bounds carry a relative epsilon
    so corners ON the quad boundary (e.g. two identical boxes, where the
    reference kernel degenerates to IoU≈0 on float rounding) test inside;
    interior results are unaffected."""
    a = quad[..., 0, :]
    ab = quad[..., 1, :] - a
    ad = quad[..., 3, :] - a
    apx = px - a[..., 0]
    apy = py - a[..., 1]
    abab = ab[..., 0] ** 2 + ab[..., 1] ** 2
    abap = ab[..., 0] * apx + ab[..., 1] * apy
    adad = ad[..., 0] ** 2 + ad[..., 1] ** 2
    adap = ad[..., 0] * apx + ad[..., 1] * apy
    tol = 1e-6 * (abab + adad)
    return (
        (abap >= -tol)
        & (abap <= abab + tol)
        & (adap >= -tol)
        & (adap <= adad + tol)
    )


def _edge_intersections(ca, cb):
    """All 4x4 edge-pair intersections of two quads.

    ca: (N, K, 4, 2), cb: (N, K, 4, 2) → points (N, K, 16, 2), valid
    (N, K, 16). Strict-inequality crossing tests exactly as the reference
    (line_segment_intersection, eval/iou.py:221-263)."""
    a0 = ca[..., :, None, :]                     # edge i start  (N,K,4,1,2)
    a1 = jnp.roll(ca, -1, axis=-2)[..., :, None, :]
    b0 = cb[..., None, :, :]                     # edge j start  (N,K,1,4,2)
    b1 = jnp.roll(cb, -1, axis=-2)[..., None, :, :]

    def gt_cross(p, q, r):
        # (r-p) x (q-p) > 0 test, elementwise over broadcast dims
        return (r[..., 1] - p[..., 1]) * (q[..., 0] - p[..., 0]) > (
            q[..., 1] - p[..., 1]
        ) * (r[..., 0] - p[..., 0])

    acd = gt_cross(a0, b0, b1)
    bcd = gt_cross(a1, b0, b1)
    abc = gt_cross(a0, a1, b0)
    abd = gt_cross(a0, a1, b1)
    valid = (acd != bcd) & (abc != abd)

    ba = a1 - a0
    dc = b1 - b0
    abba = a0[..., 0] * a1[..., 1] - a1[..., 0] * a0[..., 1]
    cddc = b0[..., 0] * b1[..., 1] - b1[..., 0] * b0[..., 1]
    dh = ba[..., 1] * dc[..., 0] - ba[..., 0] * dc[..., 1]
    dh = jnp.where(dh == 0, 1e-12, dh)
    px = (abba * dc[..., 0] - ba[..., 0] * cddc) / dh
    py = (abba * dc[..., 1] - ba[..., 1] * cddc) / dh
    pts = jnp.stack([px, py], axis=-1)
    shape = valid.shape[:-2] + (16,)
    return pts.reshape(shape + (2,)), valid.reshape(shape)


def rotated_intersection_area(boxes: jax.Array, qboxes: jax.Array) -> jax.Array:
    """(N, 5) x (K, 5) → (N, K) intersection polygon areas."""
    ca = rbbox_corners(boxes)[:, None]           # (N, 1, 4, 2)
    cb = rbbox_corners(qboxes)[None, :]          # (1, K, 4, 2)
    n, k = boxes.shape[0], qboxes.shape[0]
    ca = jnp.broadcast_to(ca, (n, k, 4, 2))
    cb = jnp.broadcast_to(cb, (n, k, 4, 2))

    # corners of A inside B / B inside A (broadcast the quad over the 4 pts)
    in_ab = _point_in_quad(ca[..., 0], ca[..., 1], cb[..., None, :, :])
    in_ba = _point_in_quad(cb[..., 0], cb[..., 1], ca[..., None, :, :])

    epts, evalid = _edge_intersections(ca, cb)

    pts = jnp.concatenate([ca, cb, epts], axis=-2)           # (N, K, 24, 2)
    valid = jnp.concatenate([in_ab, in_ba, evalid], axis=-1)  # (N, K, 24)

    count = jnp.sum(valid, axis=-1)
    denom = jnp.maximum(count, 1)
    center = jnp.sum(jnp.where(valid[..., None], pts, 0.0), axis=-2) / denom[..., None]

    ang = jnp.arctan2(pts[..., 1] - center[..., None, 1], pts[..., 0] - center[..., None, 0])
    key = jnp.where(valid, ang, jnp.inf)
    order = jnp.argsort(key, axis=-1)
    sorted_pts = jnp.take_along_axis(pts, order[..., None], axis=-2)
    sorted_valid = jnp.take_along_axis(valid, order, axis=-1)

    # fan triangulation from the first sorted vertex, |triangle| summed
    p0 = sorted_pts[..., 0:1, :]
    p1 = sorted_pts[..., 1:-1, :]
    p2 = sorted_pts[..., 2:, :]
    tri = jnp.abs(
        (p0[..., 0] - p2[..., 0]) * (p1[..., 1] - p2[..., 1])
        - (p0[..., 1] - p2[..., 1]) * (p1[..., 0] - p2[..., 0])
    ) / 2.0
    tri_valid = sorted_valid[..., 2:] & sorted_valid[..., 1:-1] & sorted_valid[..., 0:1]
    return jnp.sum(jnp.where(tri_valid, tri, 0.0), axis=-1)


def rotated_iou(boxes: jax.Array, qboxes: jax.Array, criterion: int = -1) -> jax.Array:
    """(N, 5) x (K, 5) rotated overlap with the reference's criterion codes."""
    inter = rotated_intersection_area(boxes, qboxes)
    area1 = (boxes[:, 2] * boxes[:, 3])[:, None]
    area2 = (qboxes[:, 2] * qboxes[:, 3])[None, :]
    if criterion == -1:
        denom = area1 + area2 - inter
    elif criterion == 0:
        denom = area1 + jnp.zeros_like(inter)
    elif criterion == 1:
        denom = area2 + jnp.zeros_like(inter)
    else:
        return inter
    return inter / jnp.where(denom == 0, 1e-12, denom)


def d3_iou_lidar(boxes: jax.Array, qboxes: jax.Array) -> jax.Array:
    """3D IoU of lidar [x,y,z,l,w,h,yaw] boxes with *z-centered* boxes,
    matching eval usage (reference eval/eval.py:149-170, :226-230: BEV
    rotated intersection x z-extent overlap / volume union; z treated as
    box center there)."""
    inter_bev = rotated_intersection_area(boxes[:, [0, 1, 3, 4, 6]], qboxes[:, [0, 1, 3, 4, 6]])
    z1lo = boxes[:, 2] - boxes[:, 5] / 2
    z1hi = boxes[:, 2] + boxes[:, 5] / 2
    z2lo = qboxes[:, 2] - qboxes[:, 5] / 2
    z2hi = qboxes[:, 2] + qboxes[:, 5] / 2
    iw = jnp.minimum(z1hi[:, None], z2hi[None, :]) - jnp.maximum(z1lo[:, None], z2lo[None, :])
    vol1 = (boxes[:, 3] * boxes[:, 4] * boxes[:, 5])[:, None]
    vol2 = (qboxes[:, 3] * qboxes[:, 4] * qboxes[:, 5])[None, :]
    inter3d = jnp.where(iw > 0, iw * inter_bev, 0.0)
    union = vol1 + vol2 - inter3d
    return jnp.where(inter3d > 0, inter3d / union, 0.0)


# host-facing jitted wrappers (used by eval/ap.py)
_rotated_iou_jit = jax.jit(rotated_iou, static_argnums=2)
# frame-batched variants: one dispatch covers (F, Dmax, 5) x (F, Gmax, 5)
# padded stacks — the TPU-style version of the reference's 50-part frame
# batching for its CUDA kernel (eval/eval.py:238-287)
_rotated_iou_frames_jit = jax.jit(
    jax.vmap(rotated_iou, in_axes=(0, 0, None)), static_argnums=2
)
_d3_iou_frames_jit = jax.jit(jax.vmap(d3_iou_lidar))


def rotate_iou_eval_np(boxes: np.ndarray, qboxes: np.ndarray, criterion: int = -1) -> np.ndarray:
    """Drop-in for the reference's rotate_iou_gpu_eval host API
    (eval/iou.py:603-638): numpy in/out, device compute."""
    if boxes.shape[0] == 0 or qboxes.shape[0] == 0:
        return np.zeros((boxes.shape[0], qboxes.shape[0]), np.float32)
    out = _rotated_iou_jit(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(qboxes, jnp.float32), criterion
    )
    return np.asarray(out)


def rotate_iou_frames_np(boxes: np.ndarray, qboxes: np.ndarray, criterion: int = -1) -> np.ndarray:
    """(F, Dmax, 5) x (F, Gmax, 5) padded frame stacks → (F, Dmax, Gmax)."""
    out = _rotated_iou_frames_jit(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(qboxes, jnp.float32), criterion
    )
    return np.asarray(out)


def d3_iou_frames_np(boxes: np.ndarray, qboxes: np.ndarray) -> np.ndarray:
    """(F, Dmax, 7) x (F, Gmax, 7) padded frame stacks → (F, Dmax, Gmax)."""
    out = _d3_iou_frames_jit(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(qboxes, jnp.float32)
    )
    return np.asarray(out)
