import numpy as np
import pytest

from det3d_tpu.ops.nms import greedy_nms, iou_pixel_convention
import np_ref


def random_dets(n, seed=0, spread=40.0):
    r = np.random.RandomState(seed)
    c = r.uniform(-spread, spread, (n, 2)).astype(np.float32)
    d = r.uniform(1, 8, (n, 2)).astype(np.float32)
    boxes = np.concatenate([c - d / 2, c + d / 2], -1)
    scores = r.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def run_device_nms(boxes, scores, thresh, post_max):
    """Sort host-side (as top_k would) then run the device kernel."""
    order = np.argsort(-scores, kind="stable")
    sorted_boxes = boxes[order]
    keep_mask = np.asarray(
        greedy_nms(sorted_boxes, np.ones(len(boxes), bool), thresh, post_max)
    )
    return order[keep_mask]  # original indices of kept boxes, score order


class TestGreedyNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_vs_oracle(self, seed):
        boxes, scores = random_dets(100, seed, spread=25.0)
        kept = run_device_nms(boxes, scores, 0.1, 300)
        ref = np_ref.nms_greedy_ref(boxes, scores, 0.1, 300)
        np.testing.assert_array_equal(np.sort(kept), np.sort(ref))

    def test_post_max_cap(self):
        boxes, scores = random_dets(200, 7, spread=500.0)  # sparse → few overlaps
        kept = run_device_nms(boxes, scores, 0.1, 10)
        ref = np_ref.nms_greedy_ref(boxes, scores, 0.1, 10)
        assert len(kept) == 10
        np.testing.assert_array_equal(np.sort(kept), np.sort(ref))

    def test_identical_boxes_keep_first(self):
        box = np.array([[0, 0, 4, 4]], np.float32)
        boxes = np.repeat(box, 5, axis=0)
        valid = np.ones(5, bool)
        keep = np.asarray(greedy_nms(boxes, valid, 0.1, 300))
        np.testing.assert_array_equal(keep, [True, False, False, False, False])

    def test_invalid_rows_never_kept_or_suppress(self):
        boxes = np.array([[0, 0, 4, 4], [0, 0, 4, 4], [10, 10, 14, 14]], np.float32)
        valid = np.array([False, True, True])
        keep = np.asarray(greedy_nms(boxes, valid, 0.1, 300))
        np.testing.assert_array_equal(keep, [False, True, True])

    def test_pixel_convention_iou(self):
        """The +1 pixel convention must match the reference formula."""
        a = np.array([[0.0, 0.0, 3.0, 3.0], [2.0, 2.0, 5.0, 5.0]], np.float32)
        out = np.asarray(iou_pixel_convention(a))
        inter = 2.0 * 2.0  # (min(3,5)-max(0,2)+1)^2
        area = 4.0 * 4.0
        expected = inter / (area + area - inter)
        np.testing.assert_allclose(out[0, 1], expected, rtol=1e-6)
        np.testing.assert_allclose(np.diag(out), 1.0, rtol=1e-6)

    def test_suppression_chain_exactness(self):
        """Chain A>B>C>D where each overlaps only the next: greedy keeps
        A, C (B killed by A, C revived because B is dead, D killed by C).
        The frontier while_loop must reproduce this, not over-suppress."""
        boxes = np.array(
            [[0, 0, 10, 10], [6, 0, 16, 10], [12, 0, 22, 10], [18, 0, 28, 10]],
            np.float32,
        )
        keep = np.asarray(greedy_nms(boxes, np.ones(4, bool), 0.1, 300))
        np.testing.assert_array_equal(keep, [True, False, True, False])

    @pytest.mark.parametrize("seed", [10, 11])
    def test_vs_oracle_dense(self, seed):
        """Dense overlapping field (deep chains) vs the numpy oracle."""
        boxes, scores = random_dets(400, seed, spread=15.0)
        kept = run_device_nms(boxes, scores, 0.1, 300)
        ref = np_ref.nms_greedy_ref(boxes, scores, 0.1, 300)
        np.testing.assert_array_equal(np.sort(kept), np.sort(ref))
