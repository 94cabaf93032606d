"""KITTI-protocol AP (eval/ap.py) behavioral tests.

The reference has no tests; these pin the protocol invariants the rebuild
must honor (reference eval/eval.py:10-118, :443-483).
"""

import numpy as np

from det3d_tpu.eval.ap import (
    clean_data,
    compute_statistics,
    get_official_eval_result,
    get_thresholds,
)

CLASSES = ["vehicle", "pedestrian", "cyclist"]


def make_anno(names, locs, dims, yaws, scores=None, num_points=100):
    n = len(names)
    anno = {
        "name": np.asarray(names, dtype="<U12"),
        "location": np.asarray(locs, np.float64).reshape(n, 3),
        "dimensions": np.asarray(dims, np.float64).reshape(n, 3),
        "rotation_y": np.asarray(yaws, np.float64).reshape(n),
        "num_points": np.full(n, num_points, np.int64),
        "score": np.zeros(n) if scores is None else np.asarray(scores, np.float64),
    }
    return anno


def vehicle_scene(centers, scores=None, names=None):
    n = len(centers)
    names = names or ["vehicle"] * n
    locs = [[c[0], c[1], -1.0] for c in centers]
    dims = [[4.5, 2.0, 1.8]] * n
    yaws = [0.3] * n
    return make_anno(names, locs, dims, yaws, scores)


class TestProtocol:
    def test_perfect_detection_gives_100(self):
        # ≥41 TPs with distinct scores: the AP@41 protocol can only saturate
        # when all recall sample positions are reachable (sums/11*100,
        # reference eval/eval.py:443-447)
        rng = np.random.RandomState(0)
        gt, dt = [], []
        for f in range(25):
            centers = [(5 + f, 0), (20, 3 + f)]
            gt.append(vehicle_scene(centers))
            dt.append(vehicle_scene(centers, scores=rng.uniform(0.3, 1.0, 2)))
        results, s = get_official_eval_result(gt, dt, CLASSES, 80.0)
        bev, d3 = results
        veh = CLASSES.index("vehicle")
        assert bev[veh][0] > 99.0 and d3[veh][0] > 99.0, s

    def test_no_detections_gives_0(self):
        gt = [vehicle_scene([(5, 0)])]
        dt = [make_anno([], np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0), np.zeros(0))]
        results, _ = get_official_eval_result(gt, dt, CLASSES, 80.0)
        assert results[0][0][0] == 0.0

    def test_out_of_range_gt_ignored(self):
        """gt beyond range_thresh must not create FNs (same mAP as if the
        far gt didn't exist)."""
        rng = np.random.RandomState(1)
        gt_far, gt_near, dt = [], [], []
        for f in range(25):
            centers = [(5 + f, 0), (20, 3 + f)]
            gt_far.append(vehicle_scene(centers + [(200, 0), (300, 5)]))
            gt_near.append(vehicle_scene(centers))
            dt.append(vehicle_scene(centers, scores=rng.uniform(0.3, 1.0, 2)))
        res_far, _ = get_official_eval_result(gt_far, dt, CLASSES, 80.0)
        res_near, _ = get_official_eval_result(gt_near, dt, CLASSES, 80.0)
        np.testing.assert_allclose(res_far[0][0], res_near[0][0])
        assert res_far[0][0][0] > 99.0

    def test_low_point_gt_matches_but_does_not_count(self):
        """num_points <= threshold: ignored_gt=1 — a matching dt is absorbed
        (not FP) but the gt adds no recall mass (reference eval.py:26-33)."""
        rng = np.random.RandomState(2)
        gt, dt = [], []
        for f in range(25):
            centers = [(5 + f, 0), (20, 3 + f), (40, -5 - f)]
            g = vehicle_scene(centers)
            g["num_points"] = np.array([100, 100, 3])  # third gt low-point
            gt.append(g)
            dt.append(vehicle_scene(centers, scores=rng.uniform(0.3, 1.0, 3)))
        results, _ = get_official_eval_result(gt, dt, CLASSES, 80.0)
        assert results[0][0][0] > 99.0  # no FP penalty for matching ignored gt

    def test_false_positive_lowers_precision(self):
        gt = [vehicle_scene([(5, 0)]) for _ in range(2)]
        dt = [
            vehicle_scene([(5, 0), (50, 20)], scores=[0.9, 0.95]) for _ in range(2)
        ]  # FP scored higher than TP
        results, _ = get_official_eval_result(gt, dt, CLASSES, 80.0)
        assert 0.0 < results[0][0][0] < 99.0

    def test_wrong_class_is_not_matched(self):
        gt = [vehicle_scene([(5, 0)])]
        dt = [vehicle_scene([(5, 0)], scores=[0.9], names=["pedestrian"])]
        results, _ = get_official_eval_result(gt, dt, CLASSES, 80.0)
        assert results[0][CLASSES.index("vehicle")][0] == 0.0


class TestPieces:
    def test_clean_data_flags(self):
        gt = vehicle_scene([(5, 0), (200, 0), (10, 10)])
        gt["num_points"] = np.array([100, 100, 2])
        dt = vehicle_scene([(5, 0), (90, 0)], scores=[0.9, 0.8])
        nv, ig, idt = clean_data(gt, dt, "vehicle", 5, 80.0)
        np.testing.assert_array_equal(ig, [0, -1, 1])
        np.testing.assert_array_equal(idt, [0, -1])
        assert nv == 1

    def test_thresholds_spacing(self):
        scores = np.linspace(0.99, 0.01, 50)
        th = get_thresholds(scores, num_gt=50)
        assert len(th) <= 41
        assert np.all(np.diff(th) < 0)

    def test_compute_statistics_basic(self):
        overlaps = np.array([[0.9, 0.0], [0.0, 0.2]])  # dt x gt
        ig = np.zeros(2, np.int64)
        idt = np.zeros(2, np.int64)
        scores = np.array([0.9, 0.8], np.float32)
        tp, fp, fn, th = compute_statistics(overlaps, ig, idt, scores, 0.7,
                                            thresh=0.0, compute_fp=False)
        assert (tp, fn) == (1, 1)
        tp, fp, fn, _ = compute_statistics(overlaps, ig, idt, scores, 0.7,
                                           thresh=0.0, compute_fp=True)
        assert (tp, fp, fn) == (1, 1, 1)


def test_overlaps_cache_gives_identical_results():
    rng = np.random.RandomState(5)
    gt, dt = [], []
    for f in range(10):
        centers = [(5 + f, 0), (20, 3 + f)]
        gt.append(vehicle_scene(centers))
        dt.append(vehicle_scene(centers, scores=rng.uniform(0.3, 1.0, 2)))
    cache = {}
    r1, s1 = get_official_eval_result(gt, dt, CLASSES, 80.0, overlaps_cache=cache)
    assert {"bev", "3d"} <= set(cache)
    r2, s2 = get_official_eval_result(gt, dt, CLASSES, 85.0, overlaps_cache=cache)
    r2_nc, s2_nc = get_official_eval_result(gt, dt, CLASSES, 85.0)
    assert s2 == s2_nc
    for a, b in zip(r2, r2_nc):
        np.testing.assert_array_equal(a, b)


def test_overlaps_cache_rejects_different_annos():
    import pytest

    rng = np.random.RandomState(6)
    gt = [vehicle_scene([(5, 0)])]
    dt = [vehicle_scene([(5, 0)], scores=[0.9])]
    cache = {}
    get_official_eval_result(gt, dt, CLASSES, 80.0, overlaps_cache=cache)
    gt2 = [vehicle_scene([(6, 0)])]
    with pytest.raises(ValueError, match="different annos"):
        get_official_eval_result(gt2, dt, CLASSES, 80.0, overlaps_cache=cache)


def test_all_thresholds_matcher_equals_sequential():
    """Fuzz: the vectorized multi-threshold matcher must be bit-identical to
    the per-threshold greedy loop."""
    from det3d_tpu.eval.ap import compute_statistics_all_thresholds

    rng = np.random.RandomState(11)
    for trial in range(30):
        d = rng.randint(0, 12)
        g = rng.randint(0, 10)
        overlaps = rng.uniform(0, 1, (d, g))
        ig = rng.choice([-1, 0, 1], g, p=[0.2, 0.6, 0.2]).astype(np.int64)
        idt = rng.choice([-1, 0], d, p=[0.2, 0.8]).astype(np.int64)
        scores = rng.uniform(0, 1, d).astype(np.float32)
        thresholds = np.sort(rng.uniform(0, 1, rng.randint(1, 8)))[::-1]
        min_overlap = rng.choice([0.25, 0.5, 0.7])

        tp_v, fp_v, fn_v = compute_statistics_all_thresholds(
            overlaps, ig, idt, scores, min_overlap, thresholds
        )
        for t, thresh in enumerate(thresholds):
            tp, fp, fn, _ = compute_statistics(
                overlaps, ig, idt, scores, min_overlap,
                thresh=thresh, compute_fp=True,
            )
            assert (tp_v[t], fp_v[t], fn_v[t]) == (tp, fp, fn), (
                trial, t, (tp_v[t], fp_v[t], fn_v[t]), (tp, fp, fn)
            )
