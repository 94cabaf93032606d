"""Rotated-box IoU (ops/rotated_iou) vs an exact Sutherland–Hodgman oracle.

The device kernel replaces the reference's numba.cuda polygon-clip kernels
(reference eval/iou.py:164-399, :603-638); these tests pin its numerics.
"""

import numpy as np
import pytest

import np_ref
from det3d_tpu.ops.rotated_iou import d3_iou_lidar, rotate_iou_eval_np


def random_rboxes(n, seed, spread=10.0):
    r = np.random.RandomState(seed)
    out = np.zeros((n, 5), np.float32)
    out[:, :2] = r.uniform(-spread, spread, (n, 2))
    out[:, 2:4] = r.uniform(1.0, 6.0, (n, 2))
    out[:, 4] = r.uniform(-np.pi, np.pi, n)
    return out


class TestRotatedIoU:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_vs_oracle_random(self, seed):
        a = random_rboxes(12, seed)
        b = random_rboxes(9, seed + 100)
        got = rotate_iou_eval_np(a, b)
        ref = np_ref.rotated_iou_ref(a.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_axis_aligned_analytic(self):
        a = np.array([[0, 0, 4, 4, 0]], np.float32)
        b = np.array([[2, 0, 4, 4, 0]], np.float32)  # half-overlap in x
        got = rotate_iou_eval_np(a, b)[0, 0]
        np.testing.assert_allclose(got, 8.0 / (16 + 16 - 8), atol=1e-4)

    def test_identical_and_disjoint(self):
        a = np.array([[0, 0, 4, 2, 0.7]], np.float32)
        far = np.array([[50, 50, 4, 2, -0.3]], np.float32)
        np.testing.assert_allclose(rotate_iou_eval_np(a, a)[0, 0], 1.0, atol=1e-4)
        np.testing.assert_allclose(rotate_iou_eval_np(a, far)[0, 0], 0.0, atol=1e-6)

    def test_rotated_45_cross(self):
        """Square vs the same square rotated 45°: octagon intersection,
        area = 2(√2−1)·s² for unit half-width... use the exact oracle."""
        a = np.array([[0, 0, 2, 2, 0]], np.float32)
        b = np.array([[0, 0, 2, 2, np.pi / 4]], np.float32)
        got = rotate_iou_eval_np(a, b)[0, 0]
        inter = 8 * (np.sqrt(2) - 1)  # octagon area for s=2
        np.testing.assert_allclose(got, inter / (8 - inter), atol=1e-3)

    def test_criterion_modes(self):
        a = np.array([[0, 0, 2, 2, 0]], np.float32)
        b = np.array([[0.5, 0, 2, 2, 0]], np.float32)  # inter = 1.5*2 = 3
        np.testing.assert_allclose(rotate_iou_eval_np(a, b, 0)[0, 0], 3 / 4, atol=1e-4)
        np.testing.assert_allclose(rotate_iou_eval_np(a, b, 1)[0, 0], 3 / 4, atol=1e-4)


class TestD3IoU:
    def test_full_and_partial_height_overlap(self):
        # boxes: [x y z l w h yaw] (z = bottom per lidar convention w/ origin 0)
        a = np.array([[0, 0, 0, 4, 4, 2, 0]], np.float32)
        b_same = a.copy()
        b_half_z = np.array([[0, 0, 1, 4, 4, 2, 0]], np.float32)
        iou_same = np.asarray(d3_iou_lidar(a, b_same))[0, 0]
        iou_half = np.asarray(d3_iou_lidar(a, b_half_z))[0, 0]
        np.testing.assert_allclose(iou_same, 1.0, atol=1e-4)
        # inter = 16*1, union = 32+32-16 = 48... wait: vol 32 each, inter 16
        np.testing.assert_allclose(iou_half, 16.0 / (32 + 32 - 16), atol=1e-4)

    def test_no_z_overlap(self):
        a = np.array([[0, 0, 0, 4, 4, 2, 0]], np.float32)
        b = np.array([[0, 0, 5, 4, 4, 2, 0]], np.float32)
        np.testing.assert_allclose(np.asarray(d3_iou_lidar(a, b))[0, 0], 0.0, atol=1e-6)
