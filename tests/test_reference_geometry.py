"""Direct parity: `det3d_tpu.ops.geometry` vs the reference's OWN geometry
libraries (framework/box_np_ops.py + framework/box_torch_ops.py), imported
read-only with numba stubbed to identity decorators — the jitted kernels run
as the plain Python/numpy they decorate, so reference semantics are exact
(only speed is lost; inputs are kept small).

The reference files define several names more than once and keep large
commented-out graveyards (box_np_ops.py:729-1231 is one string literal, so
`project_to_image`/`lidar_to_camera`/the second `points_in_rbbox` never
exist at run time; box_torch_ops.py:80-474 likewise). These tests therefore
compare against the modules' IMPORT-TIME surface — exactly what reference
code binds when it runs — and where this repo implements a function whose
reference original is graveyard-only (camera projection, lidar→camera), the
test validates it as the exact inverse of the LIVE reference direction
instead.
"""

from __future__ import annotations

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from det3d_tpu.ops import geometry as g

REF_ROOT = "/root/reference"


def _install_numba_stub():
    """Identity-decorator numba stub (same trick as test_reference_parity):
    decorated reference kernels run as the plain Python they wrap. Also
    stubs `cuda.local.array` + the numba dtype names so the reference's
    @cuda.jit(device=True) polygon-clip functions (eval/iou.py) run as
    ordinary numpy code."""

    def _identity_jit(*a, **k):
        if a and callable(a[0]):
            return a[0]
        return lambda f: f

    if "numba" in sys.modules and hasattr(sys.modules["numba"], "__det3d_stub__"):
        fake_numba = sys.modules["numba"]
        fake_cuda = fake_numba.cuda
    else:
        fake_cuda = types.ModuleType("numba.cuda")
        fake_cuda.jit = _identity_jit
        fake_cuda.to_device = lambda x, *a, **k: x
        fake_cuda.select_device = lambda *a, **k: None
        fake_cuda.stream = lambda: None
        fake_numba = types.ModuleType("numba")
        fake_numba.__det3d_stub__ = True
        fake_numba.jit = _identity_jit
        fake_numba.njit = _identity_jit
        fake_numba.prange = range
        fake_numba.cuda = fake_cuda
        sys.modules["numba"] = fake_numba
        sys.modules["numba.cuda"] = fake_cuda
    fake_cuda.local = types.SimpleNamespace(
        array=lambda shape, dtype: np.zeros(shape, dtype)
    )
    for dt in ("float32", "float64", "int32", "int64", "uint64"):
        setattr(fake_numba, dt, getattr(np, dt))


@pytest.fixture(scope="module")
def ref_np():
    """The reference's live numpy geometry module."""
    for name, val in (("bool", bool), ("float", float), ("int", int)):
        if not hasattr(np, name):
            setattr(np, name, val)
    _install_numba_stub()
    sys.path.insert(0, REF_ROOT)
    try:
        import framework.box_np_ops as ref_ops
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    finally:
        sys.path.remove(REF_ROOT)
    return ref_ops


@pytest.fixture(scope="module")
def ref_torch():
    """The reference's live torch geometry module."""
    _install_numba_stub()
    sys.path.insert(0, REF_ROOT)
    try:
        import framework.box_torch_ops as ref_tops
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    finally:
        sys.path.remove(REF_ROOT)
    return ref_tops


def _boxes7(r: np.random.RandomState, n: int) -> np.ndarray:
    """Random lidar boxes [x, y, z, l, w, h, yaw], f32."""
    b = np.zeros((n, 7), np.float32)
    b[:, :2] = r.uniform(-40, 40, (n, 2))
    b[:, 2] = r.uniform(-2, 1, n)
    b[:, 3:6] = r.uniform(0.5, 5.0, (n, 3))
    b[:, 6] = r.uniform(-2 * np.pi, 2 * np.pi, n)
    return b


class TestAngles:
    def test_limit_period(self, ref_np):
        r = np.random.RandomState(0)
        val = r.uniform(-10, 10, 257).astype(np.float32)
        for offset, period in [(0.5, np.pi), (0.0, np.pi), (0.5, 2 * np.pi), (1.0, np.pi / 2)]:
            np.testing.assert_allclose(
                np.asarray(g.limit_period(val, offset, period)),
                ref_np.limit_period(val, offset, period),
                rtol=1e-6, atol=1e-6,
            )

    def test_rotation_2d(self, ref_np):
        r = np.random.RandomState(1)
        pts = r.randn(33, 4, 2).astype(np.float32)
        ang = r.uniform(-np.pi, np.pi, 33).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(g.rotation_2d(pts, ang)),
            ref_np.rotation_2d(pts, ang),
            rtol=1e-5, atol=1e-5,
        )

    @pytest.mark.parametrize("axis", [1, 2])
    def test_rotation_3d_in_axis(self, ref_np, axis):
        # axis 0 is NOT compared: the reference's axis-0 matrix
        # (box_np_ops.py:556-558) is a row permutation, not a roll rotation,
        # and no live reference call site uses axis=0 (lidar corners use
        # axis=2, camera corners axis=1).
        r = np.random.RandomState(2)
        pts = r.randn(17, 8, 3).astype(np.float32)
        ang = r.uniform(-np.pi, np.pi, 17).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(g.rotation_3d_in_axis(pts, ang, axis=axis)),
            ref_np.rotation_3d_in_axis(pts, ang, axis=axis),
            rtol=1e-5, atol=1e-5,
        )

    @pytest.mark.parametrize("axis", [0, 1, 2])
    def test_rotation_points_single_angle(self, ref_np, axis):
        r = np.random.RandomState(3)
        pts = r.randn(64, 3).astype(np.float32)
        ang = np.float32(r.uniform(-np.pi, np.pi))
        np.testing.assert_allclose(
            np.asarray(g.rotation_points_single_angle(pts, ang, axis=axis)),
            ref_np.rotation_points_single_angle(pts, ang, axis=axis),
            rtol=1e-5, atol=1e-5,
        )


class TestCorners:
    @pytest.mark.parametrize("ndim,origin", [(2, 0.5), (2, 0.0), (3, 0.5), (3, (0.5, 0.5, 0.0))])
    def test_corners_nd(self, ref_np, ndim, origin):
        r = np.random.RandomState(4)
        dims = r.uniform(0.5, 5, (21, ndim)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(g.corners_nd(dims, origin=origin)),
            ref_np.corners_nd(dims, origin=origin),
            rtol=1e-6, atol=1e-6,
        )

    @pytest.mark.parametrize("with_angles", [False, True])
    def test_center_to_corner_box2d(self, ref_np, with_angles):
        r = np.random.RandomState(5)
        c = r.uniform(-40, 40, (19, 2)).astype(np.float32)
        d = r.uniform(0.5, 5, (19, 2)).astype(np.float32)
        a = r.uniform(-np.pi, np.pi, 19).astype(np.float32) if with_angles else None
        np.testing.assert_allclose(
            np.asarray(g.center_to_corner_box2d(c, d, a)),
            ref_np.center_to_corner_box2d(c, d, a),
            rtol=1e-5, atol=1e-4,
        )

    @pytest.mark.parametrize(
        "origin,axis",
        [((0.5, 0.5, 0.0), 2),   # lidar convention
         ((0.5, 1.0, 0.5), 1),   # camera convention
         ((0.5, 0.5, 0.5), 2)],  # live points_in_rbbox convention
    )
    def test_center_to_corner_box3d(self, ref_np, origin, axis):
        r = np.random.RandomState(6)
        b = _boxes7(r, 23)
        np.testing.assert_allclose(
            np.asarray(g.center_to_corner_box3d(b[:, :3], b[:, 3:6], b[:, 6], origin=origin, axis=axis)),
            ref_np.center_to_corner_box3d(b[:, :3], b[:, 3:6], b[:, 6], origin=list(origin), axis=axis),
            rtol=1e-5, atol=1e-4,
        )

    def test_corner_to_standup(self, ref_np):
        r = np.random.RandomState(7)
        corners = r.randn(29, 4, 2).astype(np.float32)
        ours = np.asarray(g.corner_to_standup(corners))
        np.testing.assert_allclose(ours, ref_np.corner_to_standup_nd(corners), rtol=1e-6)
        np.testing.assert_allclose(ours, ref_np.corner_to_standup_nd_jit(corners), rtol=1e-6)

    def test_center_to_minmax_2d(self, ref_np):
        r = np.random.RandomState(8)
        c = r.uniform(-40, 40, (31, 2)).astype(np.float32)
        d = r.uniform(0.5, 5, (31, 2)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(g.center_to_minmax_2d(c, d)),
            ref_np.center_to_minmax_2d(c, d),
            rtol=1e-6, atol=1e-6,
        )

    def test_rbbox2d_to_near_bbox(self, ref_np):
        r = np.random.RandomState(9)
        rb = np.concatenate(
            [
                r.uniform(-40, 40, (257, 2)),
                r.uniform(0.5, 5, (257, 2)),
                r.uniform(-2 * np.pi, 2 * np.pi, (257, 1)),
            ],
            axis=1,
        ).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(g.rbbox2d_to_near_bbox(rb)),
            ref_np.rbbox2d_to_near_bbox(rb),
            rtol=1e-5, atol=1e-5,
        )


class TestEncodeDecodeIoU:
    def test_box_encode(self, ref_np):
        r = np.random.RandomState(10)
        boxes, anchors = _boxes7(r, 41), _boxes7(r, 41)
        np.testing.assert_allclose(
            np.asarray(g.box_encode(boxes, anchors)),
            ref_np.box_encode(boxes, anchors),
            rtol=1e-5, atol=1e-5,
        )

    def test_box_encode_transposed(self, ref_np):
        r = np.random.RandomState(11)
        boxes, anchors = _boxes7(r, 41), _boxes7(r, 41)
        np.testing.assert_allclose(
            np.asarray(g.box_encode_transposed(boxes.T, anchors.T)).T,
            ref_np.box_encode(boxes, anchors),
            rtol=1e-5, atol=1e-5,
        )

    def test_box_decode(self, ref_np):
        r = np.random.RandomState(12)
        anchors = _boxes7(r, 41)
        enc = (r.randn(41, 7) * 0.3).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(g.box_decode(enc, anchors)),
            ref_np.box_decode(enc, anchors),
            rtol=1e-5, atol=1e-5,
        )

    def test_box_decode_matches_torch_gpu_path(self, ref_torch):
        # the GPU inference path decodes with box_torch_ops.box_decode
        # (box_torch_ops.py:61-77) — same math, torch tensors
        import torch

        r = np.random.RandomState(13)
        anchors = _boxes7(r, 37)
        enc = (r.randn(37, 7) * 0.3).astype(np.float32)
        ref = ref_torch.box_decode(torch.from_numpy(enc), torch.from_numpy(anchors))
        np.testing.assert_allclose(
            np.asarray(g.box_decode(enc, anchors)),
            ref.numpy(),
            rtol=1e-5, atol=1e-5,
        )

    @pytest.mark.parametrize("eps", [0.0, 1.0])
    def test_iou_matrix(self, ref_np, eps):
        r = np.random.RandomState(14)

        def minmax(n):
            c = r.uniform(-40, 40, (n, 2))
            d = r.uniform(0.5, 8, (n, 2))
            return np.concatenate([c - d / 2, c + d / 2], axis=1).astype(np.float32)

        boxes, queries = minmax(97), minmax(53)
        np.testing.assert_allclose(
            np.asarray(g.iou_matrix(boxes, queries, eps=eps)),
            ref_np.iou_jit(boxes, queries, eps=eps),
            rtol=1e-5, atol=1e-6,
        )


class TestMembership:
    def test_points_in_convex_polygon(self, ref_np):
        r = np.random.RandomState(15)
        boxes = _boxes7(r, 11)
        polys = ref_np.center_to_corner_box2d(boxes[:, :2], boxes[:, 3:5], boxes[:, 6])
        pts = r.uniform(-45, 45, (301, 2)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(g.points_in_convex_polygon(pts, polys)),
            ref_np.points_in_convex_polygon_jit(pts, polys, clockwise=True),
        )

    def test_points_in_rbbox(self, ref_np):
        # the LIVE reference def (box_np_ops.py:460-468; the z-bottom variant
        # at :1127 sits inside the :729-1231 graveyard string) interprets the
        # stored z as the box CENTER (origin 0.5) — this repo's default.
        r = np.random.RandomState(16)
        boxes = _boxes7(r, 7)
        pts = np.concatenate(
            [r.uniform(-45, 45, (401, 2)), r.uniform(-4, 4, (401, 1)), r.rand(401, 1)],
            axis=1,
        ).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(g.points_in_rbbox(pts, boxes)),
            ref_np.points_in_rbbox(pts, boxes),
        )

    def test_filter_gt_box_outside_range(self, ref_np):
        r = np.random.RandomState(17)
        boxes = _boxes7(r, 203)
        boxes[:, :2] = r.uniform(-100, 100, (203, 2))  # many outside
        limit = [-79.9, -79.9, 79.9, 79.9]
        np.testing.assert_array_equal(
            np.asarray(g.filter_gt_box_outside_range(boxes, limit)),
            ref_np.filter_gt_box_outside_range(boxes, np.array(limit, np.float32)),
        )


class TestFrameTransforms:
    """camera↔lidar + projection. The reference's live module only has the
    camera→lidar direction (lidar_to_camera/project_to_image are graveyard
    code, box_np_ops.py:729-1231 — the viewer's box_np_ops.project_to_image
    call would AttributeError at run time); this repo's lidar→camera is
    therefore validated as the exact inverse of the live reference
    direction."""

    def _calib(self, r):
        # near-identity rectification + a plausible velo→cam extrinsic
        theta = 0.02
        r_rect = np.eye(4, dtype=np.float32)
        r_rect[:3, :3] = np.array(
            [[np.cos(theta), -np.sin(theta), 0],
             [np.sin(theta), np.cos(theta), 0],
             [0, 0, 1]], np.float32)
        velo2cam = np.array(
            [[0, -1, 0, 0.1],
             [0, 0, -1, -0.05],
             [1, 0, 0, 0.27],
             [0, 0, 0, 1]], np.float32)
        return r_rect, velo2cam

    def test_camera_to_lidar_points(self, ref_np):
        r = np.random.RandomState(18)
        r_rect, velo2cam = self._calib(r)
        pts = r.uniform(-30, 30, (57, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(g.camera_to_lidar(pts, r_rect, velo2cam)),
            ref_np.camera_to_lidar(pts, r_rect, velo2cam),
            rtol=1e-4, atol=1e-4,
        )

    def test_box_camera_to_lidar(self, ref_np):
        r = np.random.RandomState(19)
        r_rect, velo2cam = self._calib(r)
        cam_boxes = _boxes7(r, 43)
        np.testing.assert_allclose(
            np.asarray(g.box_camera_to_lidar(cam_boxes, r_rect, velo2cam)),
            ref_np.box_camera_to_lidar(cam_boxes, r_rect, velo2cam),
            rtol=1e-4, atol=1e-4,
        )

    def test_lidar_to_camera_inverts_reference(self, ref_np):
        r = np.random.RandomState(20)
        r_rect, velo2cam = self._calib(r)
        cam_pts = r.uniform(-30, 30, (57, 3)).astype(np.float32)
        lidar = ref_np.camera_to_lidar(cam_pts, r_rect, velo2cam)
        np.testing.assert_allclose(
            np.asarray(g.lidar_to_camera(lidar.astype(np.float32), r_rect, velo2cam)),
            cam_pts, rtol=1e-4, atol=1e-4,
        )

    def test_box_lidar_to_camera_inverts_reference(self, ref_np):
        r = np.random.RandomState(21)
        r_rect, velo2cam = self._calib(r)
        cam_boxes = _boxes7(r, 43)
        lidar_boxes = ref_np.box_camera_to_lidar(cam_boxes, r_rect, velo2cam)
        np.testing.assert_allclose(
            np.asarray(g.box_lidar_to_camera(lidar_boxes.astype(np.float32), r_rect, velo2cam)),
            cam_boxes, rtol=1e-4, atol=1e-4,
        )

    def test_project_to_image_standard_projection(self):
        # graveyard-only in the reference (and its graveyard version drops
        # the projection matrix's translation column by padding with zeros —
        # box_np_ops.py:1088-1096); this repo implements the standard
        # homogeneous projection, validated against a hand-built pinhole.
        r = np.random.RandomState(22)
        f, u0, v0 = 720.0, 610.0, 170.0
        t = np.array([44.8, 0.2, 0.003], np.float32)
        proj = np.array(
            [[f, 0, u0, t[0]], [0, f, v0, t[1]], [0, 0, 1, t[2]]], np.float32)
        pts = np.concatenate(
            [r.uniform(-20, 20, (65, 2)), r.uniform(3, 60, (65, 1))], axis=1
        ).astype(np.float32)
        expect_depth = pts[:, 2] + t[2]
        expect_u = (f * pts[:, 0] + u0 * pts[:, 2] + t[0]) / expect_depth
        expect_v = (f * pts[:, 1] + v0 * pts[:, 2] + t[1]) / expect_depth
        got = np.asarray(g.project_to_image(pts, proj))
        np.testing.assert_allclose(got[:, 0], expect_u, rtol=1e-4)
        np.testing.assert_allclose(got[:, 1], expect_v, rtol=1e-4)


@pytest.fixture(scope="module")
def ref_iou():
    """The reference's rotated-IoU module (eval/iou.py) with its
    @cuda.jit(device=True) polygon-clip functions runnable as plain
    Python (numba stubbed; cuda.local.array → np.zeros)."""
    _install_numba_stub()
    sys.path.insert(0, REF_ROOT)
    try:
        import eval.iou as ref_iou_mod
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    finally:
        sys.path.remove(REF_ROOT)
    return ref_iou_mod


class TestRotatedIoUParity:
    """ops/rotated_iou.py vs the reference's OWN polygon-clip device
    functions (eval/iou.py:164-399, :547-566) run per box pair as plain
    Python. This is the exact code `rotate_iou_gpu_eval` executes per
    thread on the GPU — the mAP-critical kernel — so agreement here is
    direct evidence the vectorized jnp clip computes the reference's
    overlap matrix, not just an oracle's."""

    @staticmethod
    def _rboxes(r: np.random.RandomState, n: int) -> np.ndarray:
        b = np.zeros((n, 5), np.float32)
        b[:, :2] = r.uniform(-20, 20, (n, 2))
        b[:, 2:4] = r.uniform(0.5, 6.0, (n, 2))
        b[:, 4] = r.uniform(-2 * np.pi, 2 * np.pi, n)
        return b

    def test_rbbox_corners(self, ref_iou):
        r = np.random.RandomState(30)
        boxes = self._rboxes(r, 64)
        from det3d_tpu.ops.rotated_iou import rbbox_corners

        ours = np.asarray(rbbox_corners(jnp.asarray(boxes))).reshape(64, 8)
        for i in range(64):
            ref_c = np.zeros(8, np.float32)
            ref_iou.rbbox_to_corners(ref_c, boxes[i])
            np.testing.assert_allclose(ours[i], ref_c, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("criterion", [-1, 0, 1, 2])
    def test_pairwise_overlap(self, ref_iou, criterion):
        from det3d_tpu.ops.rotated_iou import rotated_iou

        r = np.random.RandomState(31 + criterion)
        # cluster all centers in a small region so a healthy fraction of
        # pairs genuinely overlap (spread centers would make ~every IoU 0)
        boxes = self._rboxes(r, 48)
        qboxes = self._rboxes(r, 32)
        boxes[:, :2] = r.uniform(-6, 6, (48, 2)).astype(np.float32)
        qboxes[:, :2] = r.uniform(-6, 6, (32, 2)).astype(np.float32)

        ours = np.asarray(rotated_iou(jnp.asarray(boxes), jnp.asarray(qboxes), criterion))
        ref = np.zeros((48, 32), np.float32)
        for i in range(48):
            for j in range(32):
                ref[i, j] = ref_iou.devRotateIoUEval(boxes[i], qboxes[j], criterion)
        assert (ref > 0.01).sum() > 300  # the case set is non-trivial
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)

    def test_identical_and_disjoint_boxes(self, ref_iou):
        # NOTE (documented reference degeneracy): on EXACTLY coincident
        # boxes the reference clipper's duplicate intersection vertices
        # break its pseudo-angle insertion sort and the self-IoU comes out
        # wrong from its own code (0.0 for [0,0,4,2,0.3], 0.333 for the
        # axis-ish square — verified by running eval/iou.py's
        # devRotateIoUEval directly). This repo's atan2-sort clip returns
        # the correct 1.0; exact coincidence is measure-zero in real evals
        # (a detection never equals a gt box bit-for-bit), so only the
        # OFF-diagonal (non-coincident) pairs are compared against the
        # reference.
        from det3d_tpu.ops.rotated_iou import rotated_iou

        boxes = np.array(
            [[0, 0, 4, 2, 0.3], [10, 10, 2, 2, 1.2], [0.5, 0.2, 3, 1.5, -0.7]],
            np.float32,
        )
        ours = np.asarray(rotated_iou(jnp.asarray(boxes), jnp.asarray(boxes), -1))
        ref = np.zeros((3, 3), np.float32)
        for i in range(3):
            for j in range(3):
                ref[i, j] = ref_iou.devRotateIoUEval(boxes[i], boxes[j], -1)
        np.testing.assert_allclose(np.diag(ours), 1.0, atol=1e-4)
        off = ~np.eye(3, dtype=bool)
        np.testing.assert_allclose(ours[off], ref[off], rtol=1e-3, atol=2e-3)
