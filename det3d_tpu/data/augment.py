"""Training-time point-cloud augmentation (host-side numpy, vectorized).

Functional counterpart of the reference's augmentation module (reference:
framework/augmentation.py): per-object pose noise with collision rejection,
global flip / rotation / anisotropic scaling / translation. The reference
implements the hot paths as numba kernels with sequential loops
(noise_per_box :92-120, box_collision_test :617-697, points_transform_
:400-416); here the 100-candidate collision search is vectorized over tries
and boxes, with only the unavoidable sequential accept/update loop over gt
boxes (N ≲ 50) left in python.

Runs on CPU in the input pipeline ahead of the on-device voxelizer; the
global transforms also exist as on-device jnp (`global_augment_device`) and
run inside the jitted train step with `Trainer(device_global_augment=True)`
(CLI `train --device-augment`), leaving only the per-object noise host-side.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# small numpy geometry (host twin of ops/geometry for the augment path)
# ---------------------------------------------------------------------------


def rotation_points_single_angle_np(points, angle, axis=2):
    """Reference framework/box_np_ops.py:629-648 conventions."""
    s, c = np.sin(angle), np.cos(angle)
    if axis == 1:
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], points.dtype)
    elif axis == 2 or axis == -1:
        rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], points.dtype)
    elif axis == 0:
        rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], points.dtype)
    else:
        raise ValueError(axis)
    return points @ rot


def box2d_corners_np(boxes):
    """(N, 5=[x,y,dx,dy,yaw]) → (N, 4, 2) corners, reference corner layout
    (framework/box_np_ops.py:659-679)."""
    corners_norm = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], boxes.dtype) - 0.5
    corners = boxes[:, None, 2:4] * corners_norm[None]
    s, c = np.sin(boxes[:, 4]), np.cos(boxes[:, 4])
    rot = np.stack([np.stack([c, s], -1), np.stack([-s, c], -1)], -2)  # (N,2,2)
    return np.einsum("npi,nij->npj", corners, rot) + boxes[:, None, :2]


def _points_in_quad(points, quad):
    """points (P, 2) inside clockwise quad (4, 2) → (P,) bool (all edge
    crosses negative, reference convention)."""
    vec = quad - np.roll(quad, 1, axis=0)  # (4, 2)
    cross = vec[None, :, 1] * (quad[None, :, 0] - points[:, None, 0]) - vec[None, :, 0] * (
        quad[None, :, 1] - points[:, None, 1]
    )
    return np.all(cross < 0, axis=1)


def box_collision_test_np(corners_a, corners_b):
    """Pairwise convex-quad collision, (A,4,2) x (B,4,2) → (A,B) bool.

    Vectorized counterpart of the reference's numba kernel
    (framework/augmentation.py:617-697): standup-box gate, 4x4 segment
    intersection tests, then full-containment either way."""
    a, b = corners_a.shape[0], corners_b.shape[0]
    if a == 0 or b == 0:
        return np.zeros((a, b), bool)

    # standup gate
    amin, amax = corners_a.min(1), corners_a.max(1)
    bmin, bmax = corners_b.min(1), corners_b.max(1)
    iw = np.minimum(amax[:, None, 0], bmax[None, :, 0]) - np.maximum(amin[:, None, 0], bmin[None, :, 0])
    ih = np.minimum(amax[:, None, 1], bmax[None, :, 1]) - np.maximum(amin[:, None, 1], bmin[None, :, 1])
    gate = (iw > 0) & (ih > 0)

    # segment intersections: edges a (A,4,2,2) vs edges b (B,4,2,2)
    ea0 = corners_a                                  # (A,4,2)
    ea1 = np.roll(corners_a, -1, axis=1)
    eb0 = corners_b
    eb1 = np.roll(corners_b, -1, axis=1)

    def ccw(p, q, r):
        # > 0 test of (r-p) x (q-p), broadcast over (A,4,B,4)
        return (r[..., 1] - p[..., 1]) * (q[..., 0] - p[..., 0]) > (
            q[..., 1] - p[..., 1]
        ) * (r[..., 0] - p[..., 0])

    A0 = ea0[:, :, None, None, :]
    A1 = ea1[:, :, None, None, :]
    B0 = eb0[None, None, :, :, :]
    B1 = eb1[None, None, :, :, :]
    acd = ccw(A0, B0, B1)
    bcd = ccw(A1, B0, B1)
    abc = ccw(A0, A1, B0)
    abd = ccw(A0, A1, B1)
    seg_hit = np.any((acd != bcd) & (abc != abd), axis=(1, 3))  # (A,B)

    # containment either way (only needed when no segment intersects)
    def contains(host, guest):
        # host (H,4,2) clockwise; guest points (G,4,2) → (H,G) all-inside
        vec = host - np.roll(host, 1, axis=1)  # (H,4,2)
        cross = vec[:, None, None, :, 1] * (
            host[:, None, None, :, 0] - guest[None, :, :, None, 0]
        ) - vec[:, None, None, :, 0] * (host[:, None, None, :, 1] - guest[None, :, :, None, 1])
        return np.all(cross < 0, axis=(2, 3))

    contain = contains(corners_a, corners_b) | contains(corners_b, corners_a).T
    return gate & (seg_hit | contain)


def points_in_rbbox_np(points, boxes):
    """BEV rotated-rect + z-extent membership, (P, >=3) x (K, 7) → (P, K).

    Matches the reference's LIVE `points_in_rbbox`
    (framework/box_np_ops.py:460-468, origin [0.5, 0.5, 0.5]): the stored z
    is interpreted as the box CENTER, i.e. the z window is
    (z − h/2, z + h/2) with on-plane points excluded — even though
    create_info stores the camera-label z (the box bottom) unshifted. That
    h/2-down-shifted membership window is a reference quirk, but num_points
    / difficulty / augmentation point selection are all calibrated against
    it, so it is reproduced here (verified against the reference's own code
    in tests/test_reference_parity.py::TestAugmentationParity)."""
    corners = box2d_corners_np(boxes[:, [0, 1, 3, 4, 6]].astype(np.float64))
    in_bev = np.stack(
        [_points_in_quad(points[:, :2], corners[k]) for k in range(boxes.shape[0])], -1
    ) if boxes.shape[0] else np.zeros((points.shape[0], 0), bool)
    half = boxes[:, 5] * 0.5
    z0 = boxes[:, 2] - half
    z1 = boxes[:, 2] + half
    in_z = (points[:, None, 2] > z0[None]) & (points[:, None, 2] < z1[None])
    return in_bev & in_z


# ---------------------------------------------------------------------------
# per-object noise (collision-rejected pose jitter)
# ---------------------------------------------------------------------------


def noise_per_object(
    gt_boxes: np.ndarray,
    points: np.ndarray,
    valid_mask: np.ndarray | None = None,
    rotation_perturb: float = (5.0 / 180) * np.pi,
    center_noise_std: float = 0.15,
    global_random_rot_range: float = (2.0 / 180) * np.pi,
    num_try: int = 100,
    rng: np.random.RandomState | None = None,
) -> None:
    """In-place per-object pose jitter with collision rejection.

    Reference: framework/augmentation.py:177-212 (noise_per_object). With the
    default 2° `global_random_rot_range` the reference takes the
    `noise_per_box_v2_` path (:122-175): each candidate moves the box along
    its circle around the sensor origin by a global-rotation noise (radius
    preserved, yaw co-rotated), then applies the local rotation + translation
    jitter; on acceptance the circle move is folded into the effective
    transform, which is applied to the box and (around the ORIGINAL center)
    to the points of the first containing box (points_transform_ :400-416).
    The 100-candidate search is vectorized over tries; only the sequential
    accept/update loop over boxes (N ≲ 50) remains in python.
    """
    rng = rng or np.random.RandomState()
    num_boxes = gt_boxes.shape[0]
    if num_boxes == 0:
        return
    if valid_mask is None:
        valid_mask = np.ones((num_boxes,), bool)

    loc_noises = rng.normal(scale=center_noise_std, size=[num_boxes, num_try, 3])
    rot_noises = rng.uniform(-rotation_perturb, rotation_perturb, size=[num_boxes, num_try])
    grot_noises = rng.uniform(
        -global_random_rot_range, global_random_rot_range, size=[num_boxes, num_try]
    )
    enable_grot = global_random_rot_range > (0.01 / 180) * np.pi
    if not enable_grot:
        grot_noises[:] = 0.0

    point_masks = points_in_rbbox_np(points, gt_boxes)

    boxes_bev = gt_boxes[:, [0, 1, 3, 4, 6]]
    box_corners = box2d_corners_np(boxes_bev)  # evolving state, (N,4,2)

    # effective accepted transforms (loc includes the circle move)
    eff_loc = np.zeros((num_boxes, 3))
    eff_rot = np.zeros((num_boxes,))
    success = -np.ones((num_boxes,), np.int64)

    corners_norm = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], np.float64) - 0.5
    for i in range(num_boxes):
        if not valid_mask[i]:
            continue
        # circle move around the origin per candidate (noise_per_box_v2_)
        radius = np.hypot(boxes_bev[i, 0], boxes_bev[i, 1])
        grot0 = np.arctan2(boxes_bev[i, 1], boxes_bev[i, 0])
        dst_grot = grot0 + grot_noises[i]                       # (T,)
        dst_pos = radius * np.stack([np.cos(dst_grot), np.sin(dst_grot)], -1)  # (T,2)

        # candidate corners: dims at yaw + grot + local rot, placed at
        # dst_pos + loc noise (2D rotations compose additively)
        theta = boxes_bev[i, 4] + grot_noises[i] + rot_noises[i]  # (T,)
        s, c = np.sin(theta), np.cos(theta)
        rot = np.stack([np.stack([c, s], -1), np.stack([-s, c], -1)], -2)  # (T,2,2)
        base = boxes_bev[i, 2:4] * corners_norm                  # (4,2)
        cand = np.einsum("pi,tij->tpj", base, rot) + (
            dst_pos + loc_noises[i, :, :2]
        )[:, None, :]  # (T,4,2)

        coll = box_collision_test_np(cand, box_corners)  # (T,N)
        coll[:, i] = False
        ok = ~coll.any(axis=1)
        hit = int(np.argmax(ok)) if ok.any() else -1
        if hit >= 0:
            success[i] = hit
            box_corners[i] = cand[hit]
            eff_loc[i] = loc_noises[i, hit]
            eff_loc[i, :2] += dst_pos[hit] - boxes_bev[i, :2]
            eff_rot[i] = rot_noises[i, hit] + grot_noises[i, hit]

    # apply accepted transforms to in-box points (first-containing-box rule
    # over VALID boxes only — reference points_transform_ checks valid_mask[j]
    # before the membership test, augmentation.py:400-416 — rotation about
    # the original box center)
    vmasks = point_masks & valid_mask[None, :]
    first_box = np.where(vmasks.any(1), np.argmax(vmasks, axis=1), -1)
    for i in range(num_boxes):
        if success[i] < 0 or not valid_mask[i]:
            continue
        sel = first_box == i
        if sel.any():
            centered = points[sel, :3] - gt_boxes[i, :3]
            rotated = rotation_points_single_angle_np(centered, eff_rot[i], axis=2)
            points[sel, :3] = rotated + gt_boxes[i, :3] + eff_loc[i]
        gt_boxes[i, :3] += eff_loc[i]
        gt_boxes[i, 6] += eff_rot[i]


# ---------------------------------------------------------------------------
# global transforms (reference framework/augmentation.py:9-89)
# ---------------------------------------------------------------------------


def random_flip(gt_boxes, points, rng):
    if rng.random_sample() > 0.5:
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        points[:, 1] = -points[:, 1]
    return gt_boxes, points


def global_rotation(gt_boxes, points, rng):
    """pitch ±4°, roll ±2°, yaw ±30° (reference global_rotation_v2 :29-48)."""
    pitch = rng.uniform(-4, 4) / 180 * np.pi
    points[:, :3] = rotation_points_single_angle_np(points[:, :3], pitch, axis=1)
    gt_boxes[:, :3] = rotation_points_single_angle_np(gt_boxes[:, :3], pitch, axis=1)

    roll = rng.uniform(-2, 2) / 180 * np.pi
    points[:, :3] = rotation_points_single_angle_np(points[:, :3], roll, axis=0)
    gt_boxes[:, :3] = rotation_points_single_angle_np(gt_boxes[:, :3], roll, axis=0)

    yaw = rng.uniform(-30, 30) / 180 * np.pi
    points[:, :3] = rotation_points_single_angle_np(points[:, :3], yaw, axis=2)
    gt_boxes[:, :3] = rotation_points_single_angle_np(gt_boxes[:, :3], yaw, axis=2)
    gt_boxes[:, 6] += yaw
    return gt_boxes, points


def global_scaling(gt_boxes, points, rng):
    """Anisotropic scale (reference global_scaling_v2 :57-71), including the
    dim/yaw re-fit under unequal x/y scaling."""
    x_scale = rng.uniform(0.9, 1.1)
    y_scale = rng.uniform(0.9, 1.1)
    z_scale = rng.uniform(0.95, 1.05)
    scales = np.array([x_scale, y_scale, z_scale])
    points[:, :3] *= scales
    gt_boxes[:, :3] *= scales
    yaw = gt_boxes[:, 6]
    gt_boxes[:, 3] *= np.sqrt((x_scale * np.cos(yaw)) ** 2 + (y_scale * np.sin(yaw)) ** 2)
    gt_boxes[:, 4] *= np.sqrt((x_scale * np.sin(yaw)) ** 2 + (y_scale * np.cos(yaw)) ** 2)
    gt_boxes[:, 5] *= z_scale
    gt_boxes[:, 6] = np.arctan(np.tan(yaw) * (y_scale / x_scale))
    return gt_boxes, points


def global_translate(gt_boxes, points, rng, std=(0.25, 0.25, 0.25)):
    noise = rng.normal(0, std, size=3)
    points[:, :3] += noise
    gt_boxes[:, :3] += noise
    return gt_boxes, points


# ---------------------------------------------------------------------------
# on-device global transforms (jnp): the same flip/rot/scale/translate chain,
# jittable so it can fuse into the on-device preprocess. Parameter sampling is
# split from application so tests can drive both backends with identical
# params (host numpy above ↔ device jnp below).
# ---------------------------------------------------------------------------

# Bounds the dataset's conservative host-side radius pre-filter relies on
# (GenericDataset with device_global_augment: a box whose nearest corner
# radius exceeds (rmax + GLOBAL_TRANSLATE_BOUND) / GLOBAL_SCALE_MIN can never
# re-enter the detection range). The device translate draw is clipped to
# ±GLOBAL_TRANSLATE_BOUND (8 sigma of the 0.25 std — distributionally a
# no-op) so the invariant holds by construction, not just almost surely.
GLOBAL_SCALE_MIN = 0.9
GLOBAL_TRANSLATE_BOUND = 2.0


def sample_global_augment_params(key):
    """Sample the global-augmentation parameter pytree with a jax PRNG key.

    Distributions mirror the host chain / reference exactly
    (framework/augmentation.py:9-89): flip p=0.5; pitch ±4°, roll ±2°,
    yaw ±30°; scale x,y ~ U(0.9,1.1), z ~ U(0.95,1.05); translate
    N(0, 0.25) per axis, clipped to ±GLOBAL_TRANSLATE_BOUND (8 sigma) so the
    dataset's radius pre-filter bound is exact."""
    import jax
    import jax.numpy as jnp

    kf, kp, kr, ky, ksx, ksy, ksz, kt = jax.random.split(key, 8)
    deg = jnp.pi / 180.0
    return {
        "flip": jax.random.bernoulli(kf),
        "pitch": jax.random.uniform(kp, minval=-4 * deg, maxval=4 * deg),
        "roll": jax.random.uniform(kr, minval=-2 * deg, maxval=2 * deg),
        "yaw": jax.random.uniform(ky, minval=-30 * deg, maxval=30 * deg),
        "scale": jnp.stack(
            [
                jax.random.uniform(ksx, minval=0.9, maxval=1.1),
                jax.random.uniform(ksy, minval=0.9, maxval=1.1),
                jax.random.uniform(ksz, minval=0.95, maxval=1.05),
            ]
        ),
        "translate": jnp.clip(
            0.25 * jax.random.normal(kt, (3,)),
            -GLOBAL_TRANSLATE_BOUND,
            GLOBAL_TRANSLATE_BOUND,
        ),
    }


def apply_global_augment(points, gt_boxes, params):
    """Apply sampled global-augment params on device (jnp, jittable).

    Same operation order and math as the host chain (flip → pitch/roll/yaw
    rotation → anisotropic scale with dim/yaw re-fit → translate). `points`
    is (P, >=3) (padded rows transform harmlessly), `gt_boxes` (N, 7).
    Returns (points, gt_boxes)."""
    import jax.numpy as jnp

    from det3d_tpu.ops.geometry import rotation_points_single_angle

    pxyz = points[:, :3]
    extra = points[:, 3:]
    ctr, dims, yaw = gt_boxes[:, :3], gt_boxes[:, 3:6], gt_boxes[:, 6]

    # flip over y
    sign = jnp.where(params["flip"], -1.0, 1.0).astype(points.dtype)
    flip_vec = jnp.stack([jnp.ones_like(sign), sign, jnp.ones_like(sign)])
    pxyz = pxyz * flip_vec
    ctr = ctr * flip_vec
    yaw = yaw * sign

    # pitch (axis=1), roll (axis=0), yaw (axis=2) — reference order
    for angle, axis in ((params["pitch"], 1), (params["roll"], 0), (params["yaw"], 2)):
        pxyz = rotation_points_single_angle(pxyz, angle, axis=axis)
        ctr = rotation_points_single_angle(ctr, angle, axis=axis)
    yaw = yaw + params["yaw"]

    # anisotropic scale with the dim/yaw re-fit (global_scaling_v2 :57-71)
    scale = params["scale"].astype(points.dtype)
    pxyz = pxyz * scale
    ctr = ctr * scale
    sx, sy, sz = scale[0], scale[1], scale[2]
    dx = dims[:, 0] * jnp.sqrt((sx * jnp.cos(yaw)) ** 2 + (sy * jnp.sin(yaw)) ** 2)
    dy = dims[:, 1] * jnp.sqrt((sx * jnp.sin(yaw)) ** 2 + (sy * jnp.cos(yaw)) ** 2)
    dz = dims[:, 2] * sz
    yaw = jnp.arctan(jnp.tan(yaw) * (sy / sx))

    # translate
    t = params["translate"].astype(points.dtype)
    pxyz = pxyz + t
    ctr = ctr + t

    points = jnp.concatenate([pxyz, extra], axis=1)
    gt_boxes = jnp.concatenate(
        [ctr, jnp.stack([dx, dy, dz], -1), yaw[:, None]], axis=1
    )
    return points, gt_boxes


def global_augment_device(points, gt_boxes, key):
    """Sample + apply the global transforms on device in one jittable call."""
    return apply_global_augment(points, gt_boxes, sample_global_augment_params(key))


def augment_sample(points, gt_boxes, gt_valid_mask=None, rng=None, *, global_transforms=True):
    """Full training augmentation chain, reference order
    (framework/dataset.py:122-133): per-object noise → flip → rotation →
    scaling → translation. Mutates and returns (gt_boxes, points).

    `global_transforms=False` keeps only the per-object noise (whose
    collision search is inherently sequential and stays host-side) — used
    when the global transforms run on device instead
    (`Trainer(device_global_augment=True)` applies `apply_global_augment`
    inside the jitted step)."""
    rng = rng or np.random.RandomState()
    noise_per_object(gt_boxes, points, gt_valid_mask, rng=rng)
    if not global_transforms:
        return gt_boxes, points
    gt_boxes, points = random_flip(gt_boxes, points, rng)
    gt_boxes, points = global_rotation(gt_boxes, points, rng)
    gt_boxes, points = global_scaling(gt_boxes, points, rng)
    gt_boxes, points = global_translate(gt_boxes, points, rng)
    return gt_boxes, points
