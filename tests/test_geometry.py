import numpy as np
import pytest

from det3d_tpu.ops import geometry as G
import np_ref


def rng():
    return np.random.RandomState(0)


def random_boxes(n, r=None):
    r = r or rng()
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :2] = r.uniform(-50, 50, (n, 2))
    boxes[:, 2] = r.uniform(-2, 2, n)
    boxes[:, 3:6] = r.uniform(0.5, 8.0, (n, 3))
    boxes[:, 6] = r.uniform(-np.pi, np.pi, n)
    return boxes


class TestLimitPeriod:
    def test_golden(self):
        # wrap into [-pi/2, pi/2) with default offset/period
        vals = np.array([0.0, np.pi / 2, np.pi, -np.pi, 2.6], np.float32)
        out = np.asarray(G.limit_period(vals))
        assert np.all(out >= -np.pi / 2 - 1e-6)
        assert np.all(out < np.pi / 2 + 1e-6)
        np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
        # sin must be preserved up to sign flips of period pi → |sin| preserved
        np.testing.assert_allclose(np.abs(np.sin(out)), np.abs(np.sin(vals)), atol=1e-5)

    def test_full_period(self):
        vals = np.array([3 * np.pi, -3 * np.pi, 0.1], np.float32)
        out = np.asarray(G.limit_period(vals, period=2 * np.pi))
        np.testing.assert_allclose(np.sin(out), np.sin(vals), atol=1e-5)
        np.testing.assert_allclose(np.cos(out), np.cos(vals), atol=1e-5)


class TestCorners:
    def test_unit_square_clockwise(self):
        dims = np.array([[2.0, 2.0]], np.float32)
        corners = np.asarray(G.corners_nd(dims))  # origin 0.5 → centered
        expected = np.array([[[-1, -1], [-1, 1], [1, 1], [1, -1]]], np.float32)
        np.testing.assert_allclose(corners, expected)

    def test_rotation_90deg(self):
        centers = np.zeros((1, 2), np.float32)
        dims = np.array([[4.0, 2.0]], np.float32)
        angles = np.array([np.pi / 2], np.float32)
        corners = np.asarray(G.center_to_corner_box2d(centers, dims, angles))
        # clockwise rotation by +90°: (x, y) → (-y, x) under the reference's
        # row-vector convention p @ [[c, s], [-s, c]]
        base = np.array([[-2, -1], [-2, 1], [2, 1], [2, -1]], np.float32)
        expected = np.stack([-base[:, 1], base[:, 0]], -1)
        np.testing.assert_allclose(corners[0], expected, atol=1e-5)

    def test_standup(self):
        r = rng()
        boxes = random_boxes(32, r)
        corners = np.asarray(G.center_to_corner_box2d(boxes[:, :2], boxes[:, 3:5], boxes[:, 6]))
        standup = np.asarray(G.corner_to_standup(corners))
        np.testing.assert_allclose(standup[:, 0], corners[..., 0].min(1), atol=1e-6)
        np.testing.assert_allclose(standup[:, 3], corners[..., 1].max(1), atol=1e-6)


class TestEncodeDecode:
    def test_vs_oracle(self):
        r = rng()
        boxes = random_boxes(128, r)
        anchors = random_boxes(128, r)
        enc = np.asarray(G.box_encode(boxes, anchors))
        np.testing.assert_allclose(enc, np_ref.box_encode_ref(boxes, anchors), rtol=1e-3, atol=1e-4)
        dec = np.asarray(G.box_decode(enc, anchors))
        np.testing.assert_allclose(dec, np_ref.box_decode_ref(enc, anchors), rtol=1e-3, atol=1e-3)

    def test_encode_decode_not_inverse_in_z(self):
        """The reference pair is asymmetric in z (encode uses z-bottom,
        decode shifts z-center); verify we reproduce that asymmetry."""
        r = rng()
        boxes = random_boxes(64, r)
        anchors = random_boxes(64, r)
        dec = np.asarray(G.box_decode(G.box_encode(boxes, anchors), anchors))
        np.testing.assert_allclose(dec[:, :2], boxes[:, :2], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(dec[:, 3:], boxes[:, 3:], rtol=1e-3, atol=1e-3)
        # z comes back shifted by (ha - hg)/2
        shift = (anchors[:, 5] - boxes[:, 5]) / 2
        np.testing.assert_allclose(dec[:, 2] - boxes[:, 2], shift, rtol=1e-3, atol=1e-3)


class TestNearBBox:
    def test_axis_aligned(self):
        rb = np.array([[0, 0, 4, 2, 0.0]], np.float32)
        out = np.asarray(G.rbbox2d_to_near_bbox(rb))
        np.testing.assert_allclose(out, [[-2, -1, 2, 1]], atol=1e-6)

    def test_quarter_turn_swaps_dims(self):
        rb = np.array([[0, 0, 4, 2, np.pi / 2]], np.float32)
        out = np.asarray(G.rbbox2d_to_near_bbox(rb))
        np.testing.assert_allclose(out, [[-1, -2, 1, 2]], atol=1e-5)


class TestIoU:
    @pytest.mark.parametrize("eps", [0.0, 1.0])
    def test_vs_oracle(self, eps):
        r = rng()
        def mk(n):
            c = r.uniform(-20, 20, (n, 2)).astype(np.float32)
            d = r.uniform(1, 6, (n, 2)).astype(np.float32)
            return np.concatenate([c - d / 2, c + d / 2], -1)
        a, b = mk(40), mk(25)
        out = np.asarray(G.iou_matrix(a, b, eps=eps))
        np.testing.assert_allclose(out, np_ref.iou_ref(a, b, eps=eps), rtol=1e-5, atol=1e-6)


class TestPointsInBox:
    def test_points_in_rbbox(self):
        # reference-live convention (box_np_ops.py:460-468): z origin 0.5,
        # so the window is (z-h/2, z+h/2), on-plane excluded
        boxes = np.array([[0, 0, 0, 4, 2, 2, 0]], np.float32)
        pts = np.array(
            [
                [0, 0, 0.5, 0],    # inside (z within (-1, 1))
                [1.9, 0.9, -0.5, 0],
                [2.1, 0, 0.5, 0],  # outside x
                [0, 0, 1.5, 0],    # above
                [0, 0, -1.1, 0],   # below
                [0, 0, 1.0, 0],    # exactly on the top plane -> excluded
            ],
            np.float32,
        )
        out = np.asarray(G.points_in_rbbox(pts, boxes))[:, 0]
        np.testing.assert_array_equal(out, [True, True, False, False, False, False])
        # bottom-anchored membership stays available via origin
        out0 = np.asarray(G.points_in_rbbox(pts, boxes, origin=(0.5, 0.5, 0.0)))[:, 0]
        np.testing.assert_array_equal(out0, [True, False, False, True, False, True])

    def test_rotated(self):
        boxes = np.array([[0, 0, 0, 4, 2, 2, np.pi / 2]], np.float32)
        pts = np.array([[0.9, 1.9, 0.5, 0], [1.9, 0.9, 0.5, 0]], np.float32)
        out = np.asarray(G.points_in_rbbox(pts, boxes))[:, 0]
        np.testing.assert_array_equal(out, [True, False])


class TestFilterRange:
    def test_basic(self):
        boxes = np.array(
            [[0, 0, 0, 2, 2, 2, 0.0], [200, 200, 0, 2, 2, 2, 0.0]], np.float32
        )
        lim = np.array([-80, -80, 80, 80], np.float32)
        out = np.asarray(G.filter_gt_box_outside_range(boxes, lim))
        np.testing.assert_array_equal(out, [True, False])


class TestCameraTransforms:
    def _calib(self):
        import numpy as np

        r_rect = np.eye(4)
        velo2cam = np.array(
            [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]]
        )
        proj = np.array(
            [[720.0, 0, 600, 0], [0, 720.0, 180, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        )
        return r_rect, velo2cam, proj

    def test_camera_lidar_roundtrip(self):
        import numpy as np

        from det3d_tpu.ops import geometry as g

        r_rect, velo2cam, _ = self._calib()
        rng = np.random.RandomState(0)
        pts = rng.randn(50, 3).astype(np.float32) * 10
        cam = np.asarray(g.lidar_to_camera(pts, r_rect, velo2cam))
        back = np.asarray(g.camera_to_lidar(cam, r_rect, velo2cam))
        np.testing.assert_allclose(back, pts, atol=1e-4)

    def test_box_roundtrip(self):
        import numpy as np

        from det3d_tpu.ops import geometry as g

        r_rect, velo2cam, _ = self._calib()
        boxes = np.array([[5.0, 2.0, -1.0, 1.8, 4.2, 1.6, 0.3]], np.float32)
        cam = np.asarray(g.box_lidar_to_camera(boxes, r_rect, velo2cam))
        back = np.asarray(g.box_camera_to_lidar(cam, r_rect, velo2cam))
        np.testing.assert_allclose(back, boxes, atol=1e-4)

    def test_projection_center_pixel(self):
        import numpy as np

        from det3d_tpu.ops import geometry as g

        _, _, proj = self._calib()
        # a point on the optical axis projects to the principal point
        img = np.asarray(g.project_to_image(np.array([[0.0, 0, 10.0]]), proj))
        np.testing.assert_allclose(img[0], [600.0, 180.0], atol=1e-4)

    def test_frustum_mask(self):
        import numpy as np

        from det3d_tpu.ops import geometry as g

        r_rect, velo2cam, proj = self._calib()
        pts = np.array(
            [[10.0, 0, 0, 0],    # dead ahead → center of image
             [-10.0, 0, 0, 0],   # behind camera
             [10.0, 50.0, 0, 0]] # far off to the side
        , np.float32)
        m = np.asarray(
            g.corners_to_frustum_mask(pts, [0, 0, 1200, 360], proj, r_rect, velo2cam)
        )
        np.testing.assert_array_equal(m, [True, False, False])
