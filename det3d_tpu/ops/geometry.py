"""Box/geometry kernel library (JAX, fully vectorized, jit-safe).

TPU-native counterpart of the live surface of the reference's numpy/numba
geometry libraries (reference: framework/box_np_ops.py, framework/
box_torch_ops.py). All functions are pure `jnp`, static-shape, and usable
inside `jax.jit` / Pallas callers; the numba CPU kernels and numba.cuda GPU
kernels of the reference collapse into vectorized XLA here.

Box convention (identical to the reference): 3D boxes are
``[x, y, z, l, w, h, yaw]`` with z the *bottom* of the box in encode/targets
and decode shifting to/from z-center internally
(reference: framework/box_np_ops.py:366-423).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# periods / angles
# ---------------------------------------------------------------------------


def limit_period(val, offset: float = 0.5, period: float = float(np.pi)):
    """Wrap angles into ``[-offset*period, (1-offset)*period)``.

    Reference: framework/box_np_ops.py:102-103."""
    return val - jnp.floor(val / period + offset) * period


def rotation_2d(points, angles):
    """Rotate 2D point sets clockwise for positive angles.

    points: (N, P, 2); angles: (N,). Reference: framework/box_np_ops.py:64-78
    (same clockwise convention)."""
    rot_sin = jnp.sin(angles)
    rot_cos = jnp.cos(angles)
    # row-major application: p @ R_T with R_T = [[cos, sin], [-sin, cos]]
    rot = jnp.stack(
        [jnp.stack([rot_cos, rot_sin], -1), jnp.stack([-rot_sin, rot_cos], -1)],
        axis=-2,
    )  # (N, 2, 2)
    return jnp.einsum("npi,nij->npj", points, rot)


def rotation_3d_in_axis(points, angles, axis: int = 2):
    """Rotate 3D point sets about one axis (reference:
    framework/box_torch_ops.py:243-271 semantics)."""
    rot_sin = jnp.sin(angles)
    rot_cos = jnp.cos(angles)
    ones = jnp.ones_like(rot_cos)
    zeros = jnp.zeros_like(rot_cos)
    if axis == 1:
        rot = jnp.stack(
            [rot_cos, zeros, -rot_sin, zeros, ones, zeros, rot_sin, zeros, rot_cos],
            axis=-1,
        )
    elif axis == 2 or axis == -1:
        rot = jnp.stack(
            [rot_cos, rot_sin, zeros, -rot_sin, rot_cos, zeros, zeros, zeros, ones],
            axis=-1,
        )
    elif axis == 0:
        rot = jnp.stack(
            [ones, zeros, zeros, zeros, rot_cos, rot_sin, zeros, -rot_sin, rot_cos],
            axis=-1,
        )
    else:
        raise ValueError(f"axis must be 0/1/2, got {axis}")
    rot = rot.reshape(angles.shape + (3, 3))
    return jnp.einsum("...pi,...ij->...pj", points, rot)


def rotation_points_single_angle(points, angle, axis: int = 2):
    """Rotate a flat point set (N, 3) by one scalar angle about `axis`.

    Matches reference framework/box_np_ops.py:629-648 exactly — note its
    axis-0/1 matrices are *transposed* relative to `rotation_3d_in_axis`
    (the reference is self-inconsistent between its corner path and its
    augmentation path; the augmentation convention is reproduced here)."""
    s = jnp.sin(angle)
    c = jnp.cos(angle)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    if axis == 1:  # pitch
        rot = jnp.stack([c, zero, s, zero, one, zero, -s, zero, c])
    elif axis == 2 or axis == -1:  # yaw
        rot = jnp.stack([c, s, zero, -s, c, zero, zero, zero, one])
    elif axis == 0:  # roll
        rot = jnp.stack([one, zero, zero, zero, c, -s, zero, s, c])
    else:
        raise ValueError(f"axis must be 0/1/2, got {axis}")
    return points @ rot.reshape(3, 3).astype(points.dtype)


# ---------------------------------------------------------------------------
# corners
# ---------------------------------------------------------------------------

# clockwise 2D unit-corner layout (reference: framework/box_np_ops.py:122-153)
_CORNERS2D = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], np.float32)
_CORNERS3D = np.array(
    [
        [0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
        [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0],
    ],
    np.float32,
)


def corners_nd(dims, origin=0.5):
    """Box dims → relative corner offsets; clockwise 2D layout matches the
    reference (framework/box_np_ops.py:122-153)."""
    ndim = dims.shape[-1]
    base = _CORNERS2D if ndim == 2 else _CORNERS3D
    corners_norm = jnp.asarray(base, dims.dtype) - jnp.asarray(origin, dims.dtype)
    return dims[..., None, :] * corners_norm


def center_to_corner_box2d(centers, dims, angles=None, origin=0.5):
    """(N,2) centers + (N,2) dims (+ yaw) → (N,4,2) corners.

    Reference: framework/box_np_ops.py:81-99."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_2d(corners, angles)
    return corners + centers[..., None, :]


def center_to_corner_box3d(centers, dims, angles=None, origin=(0.5, 0.5, 0.0), axis: int = 2):
    """(N,3)+(N,3)(+yaw) → (N,8,3) corners; z-bottom origin default matches
    lidar boxes (reference: framework/box_torch_ops.py:302-326)."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_3d_in_axis(corners, angles, axis=axis)
    return corners + centers[..., None, :]


def corner_to_standup(boxes_corner):
    """(N,P,2) corners → (N,4) axis-aligned [xmin,ymin,xmax,ymax].

    Reference: framework/box_np_ops.py corner_to_standup_nd."""
    mins = jnp.min(boxes_corner, axis=-2)
    maxs = jnp.max(boxes_corner, axis=-2)
    return jnp.concatenate([mins, maxs], axis=-1)


def center_to_minmax_2d(centers, dims):
    """Axis-aligned center/dims → [xmin,ymin,xmax,ymax]
    (reference: framework/box_np_ops.py:323-331, origin 0.5 path)."""
    return jnp.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


def rbbox2d_to_near_bbox(rbboxes):
    """Rotated BEV box → nearest axis-aligned box: boxes within 45° of a
    quarter-turn swap their dims. Reference: framework/box_np_ops.py:308-320.

    rbboxes: (N, 5) = [x, y, xdim, ydim, yaw] → (N, 4) minmax box."""
    rots = rbboxes[..., -1]
    rots_0_pi_div_2 = jnp.abs(limit_period(rots, 0.5, jnp.pi))
    cond = (rots_0_pi_div_2 > jnp.pi / 4)[..., None]
    dims = jnp.where(cond, rbboxes[..., [3, 2]], rbboxes[..., [2, 3]])
    return center_to_minmax_2d(rbboxes[..., :2], dims)


# ---------------------------------------------------------------------------
# box encode / decode (anchor residuals)
# ---------------------------------------------------------------------------


def box_encode(boxes, anchors):
    """Encode gt boxes vs anchors into 7-dim regression targets.

    Matches reference framework/box_np_ops.py:366-382 exactly: xy normalized
    by the anchor BEV diagonal, z by anchor height, log-ratio dims, Δyaw.
    boxes/anchors: (..., 7)."""
    xa, ya, za, la, wa, ha, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, lg, wg, hg, rg = jnp.split(boxes, 7, axis=-1)
    diagonal = jnp.sqrt(la**2 + wa**2)
    xt = (xg - xa) / diagonal
    yt = (yg - ya) / diagonal
    zt = (zg - za) / ha
    lt = jnp.log(lg / la)
    wt = jnp.log(wg / wa)
    ht = jnp.log(hg / ha)
    rt = rg - ra
    return jnp.concatenate([xt, yt, zt, lt, wt, ht, rt], axis=-1)


def box_encode_transposed(boxes_t, anchors_t):
    """box_encode on (7, N)-oriented inputs → (7, N) targets.

    Same math as box_encode; the channel-major orientation keeps the N-wide
    elementwise ops on full VPU lanes (the (N, 7) orientation pads 7 → 128
    lanes and costs ~10x on million-anchor inputs)."""
    xa, ya, za, la, wa, ha, ra = (anchors_t[i] for i in range(7))
    xg, yg, zg, lg, wg, hg, rg = (boxes_t[i] for i in range(7))
    diagonal = jnp.sqrt(la**2 + wa**2)
    return jnp.stack(
        [
            (xg - xa) / diagonal,
            (yg - ya) / diagonal,
            (zg - za) / ha,
            jnp.log(lg / la),
            jnp.log(wg / wa),
            jnp.log(hg / ha),
            rg - ra,
        ]
    )


def box_decode(box_encodings, anchors):
    """Decode 7-dim regression outputs vs anchors back to boxes.

    Matches reference framework/box_np_ops.py:406-423 exactly, including the
    z-center shift asymmetry vs `box_encode` (za+ha/2 in, zg-hg/2 out)."""
    xa, ya, za, la, wa, ha, ra = jnp.split(anchors, 7, axis=-1)
    xt, yt, zt, lt, wt, ht, rt = jnp.split(box_encodings, 7, axis=-1)
    za = za + ha / 2
    diagonal = jnp.sqrt(la**2 + wa**2)
    xg = xt * diagonal + xa
    yg = yt * diagonal + ya
    zg = zt * ha + za
    lg = jnp.exp(lt) * la
    wg = jnp.exp(wt) * wa
    hg = jnp.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    return jnp.concatenate([xg, yg, zg, lg, wg, hg, rg], axis=-1)


# ---------------------------------------------------------------------------
# IoU (axis-aligned, N x K, vectorized — replaces numba iou_jit)
# ---------------------------------------------------------------------------


def iou_matrix(boxes, query_boxes, eps: float = 0.0):
    """Pairwise IoU of axis-aligned minmax boxes, (N,4) x (K,4) → (N,K).

    Vectorized XLA counterpart of the numba kernel at reference
    framework/box_np_ops.py:334-363 (including its `eps` pixel convention and
    the iw/ih>0 gating)."""
    b = boxes[:, None, :]
    q = query_boxes[None, :, :]
    iw = jnp.minimum(b[..., 2], q[..., 2]) - jnp.maximum(b[..., 0], q[..., 0]) + eps
    ih = jnp.minimum(b[..., 3], q[..., 3]) - jnp.maximum(b[..., 1], q[..., 1]) + eps
    inter = jnp.where((iw > 0) & (ih > 0), iw * ih, 0.0)
    area_b = (b[..., 2] - b[..., 0] + eps) * (b[..., 3] - b[..., 1] + eps)
    area_q = (q[..., 2] - q[..., 0] + eps) * (q[..., 3] - q[..., 1] + eps)
    union = area_b + area_q - inter
    return jnp.where(inter > 0, inter / union, 0.0)


# ---------------------------------------------------------------------------
# point-in-box tests (used by augmentation + create_info)
# ---------------------------------------------------------------------------


def points_in_convex_polygon(points, polygon):
    """points (N,2) vs clockwise convex polygons (K,P,2) → (N,K) bool.

    Vectorized counterpart of reference framework/box_np_ops.py:21-54: a point
    is inside iff every directed-edge cross product is negative."""
    # directed edges: vertex k minus previous vertex (clockwise)
    vec = polygon - jnp.roll(polygon, 1, axis=1)  # (K, P, 2)
    # cross_k = vec.y * (poly.x - p.x) - vec.x * (poly.y - p.y)
    px = points[:, None, None, 0]
    py = points[:, None, None, 1]
    cross = vec[None, :, :, 1] * (polygon[None, :, :, 0] - px) - vec[None, :, :, 0] * (
        polygon[None, :, :, 1] - py
    )
    return jnp.all(cross < 0, axis=-1)


def points_in_rbbox(points, boxes, z_axis: int = 2, origin=(0.5, 0.5, 0.5)):
    """points (N,>=3) vs 3D boxes (K,7) → (N,K) bool membership.

    Counterpart of the reference's LIVE `points_in_rbbox`
    (framework/box_np_ops.py:460-468): z is interpreted with origin 0.5
    (stored z = box center) and on-plane points are excluded — the
    reference quirk `data/augment.points_in_rbbox_np` documents. Pass
    `origin=(0.5, 0.5, 0.0)` for true bottom-anchored membership."""
    # BEV test via convex polygon
    corners = center_to_corner_box2d(boxes[:, :2], boxes[:, 3:5], boxes[:, 6])
    in_bev = points_in_convex_polygon(points[:, :2], corners)
    z0 = boxes[:, 2] - boxes[:, 5] * origin[2]
    z1 = z0 + boxes[:, 5]
    in_z = (points[:, None, z_axis] > z0[None, :]) & (points[:, None, z_axis] < z1[None, :])
    return in_bev & in_z


def filter_gt_box_outside_range(gt_boxes, limit_range):
    """True per gt box if any BEV corner falls inside `limit_range`
    [xmin,ymin,xmax,ymax]. Reference: framework/box_np_ops.py:6-16."""
    corners = center_to_corner_box2d(gt_boxes[:, :2], gt_boxes[:, 3:5], gt_boxes[:, 6])  # (N,4,2)
    lr = jnp.asarray(limit_range)
    center = lr[:2]
    dims = lr[2:] - center
    bbox = center_to_corner_box2d(center[None, :], dims[None, :], origin=0.0)  # (1,4,2)
    inside = points_in_convex_polygon(corners.reshape(-1, 2), bbox)  # (N*4, 1)
    return jnp.any(inside.reshape(-1, 4), axis=1)


# ---------------------------------------------------------------------------
# camera <-> lidar frame transforms (create_info path)
# ---------------------------------------------------------------------------


def camera_to_lidar(points, r_rect, velo2cam):
    """Camera-frame points → lidar frame (reference:
    framework/box_np_ops.py:114-119)."""
    points = jnp.asarray(points)
    num = points.shape[0]
    if points.shape[-1] == 3:
        points = jnp.concatenate([points, jnp.ones((num, 1), points.dtype)], axis=-1)
    lidar = points @ jnp.linalg.inv((r_rect @ velo2cam).T)
    return lidar[..., :3]


def box_camera_to_lidar(data, r_rect, velo2cam):
    """Camera-frame [x,y,z,l,h,w,r] boxes → lidar [x,y,z,w,l,h,r]
    (reference: framework/box_np_ops.py:106-111)."""
    xyz = data[:, 0:3]
    l, h, w = data[:, 3:4], data[:, 4:5], data[:, 5:6]
    r = data[:, 6:7]
    xyz_lidar = camera_to_lidar(xyz, r_rect, velo2cam)
    return jnp.concatenate([xyz_lidar, w, l, h, r], axis=1)


def lidar_to_camera(points, r_rect, velo2cam):
    """Lidar-frame points → camera frame (reference:
    framework/box_np_ops.py:1088-1094 inverse of camera_to_lidar)."""
    points = jnp.asarray(points)
    num = points.shape[0]
    if points.shape[-1] == 3:
        points = jnp.concatenate([points, jnp.ones((num, 1), points.dtype)], axis=-1)
    camera = points @ (r_rect @ velo2cam).T
    return camera[..., :3]


def box_lidar_to_camera(data, r_rect, velo2cam):
    """Lidar [x,y,z,w,l,h,r] boxes → camera [x,y,z,l,h,w,r] (inverse of
    box_camera_to_lidar; reference framework/box_np_ops.py:1097-1105)."""
    xyz = lidar_to_camera(data[:, 0:3], r_rect, velo2cam)
    w, l, h = data[:, 3:4], data[:, 4:5], data[:, 5:6]
    r = data[:, 6:7]
    return jnp.concatenate([xyz, l, h, w, r], axis=1)


def project_to_image(points_3d, proj_mat):
    """3D camera-frame points → image plane via a 3x4/4x4 projection matrix.

    Standard homogeneous projection. The reference's own version
    (framework/box_np_ops.py:1088-1096) survives only inside the :729-1231
    graveyard string — the viewer's `box_np_ops.project_to_image` calls
    would AttributeError at run time — and it pads the homogeneous column
    with ZEROS, silently dropping the projection matrix's translation
    (the camera baseline for KITTI P2). This implementation keeps it."""
    points_3d = jnp.asarray(points_3d)
    shape = points_3d.shape[:-1]
    pts = jnp.concatenate(
        [points_3d, jnp.ones(shape + (1,), points_3d.dtype)], axis=-1
    )
    p = jnp.asarray(proj_mat)
    if p.shape == (4, 4):
        p = p[:3]
    cam = pts @ p.T
    return cam[..., :2] / cam[..., 2:3]


def corners_to_frustum_mask(points, bbox, proj_mat, r_rect, velo2cam):
    """Lidar points inside the camera frustum of an image bbox
    [xmin,ymin,xmax,ymax] (the remove-outside-points pattern, reference
    framework/box_np_ops.py:988-1007): project points into the image and
    keep those landing inside the bbox with positive depth."""
    cam = lidar_to_camera(points[:, :3], r_rect, velo2cam)
    img = project_to_image(cam, proj_mat)
    b = jnp.asarray(bbox)
    return (
        (cam[:, 2] > 0)
        & (img[:, 0] >= b[0])
        & (img[:, 0] <= b[2])
        & (img[:, 1] >= b[1])
        & (img[:, 1] <= b[3])
    )
