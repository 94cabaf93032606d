"""KITTI-protocol average precision (AP@41 recall points), BEV + 3D, lidar
frame.

Host-side numpy port of the reference's eval bookkeeping (reference:
eval/eval.py) with the rotated-IoU matrices computed on device
(ops/rotated_iou.py replaces the numba.cuda kernels of eval/iou.py):

  * per-class ignore logic by num_points(>5) and range (clean_data,
    eval/eval.py:10-39);
  * adaptive score thresholds targeting 41 recall samples (get_thresholds,
    :42-59);
  * greedy TP/FP/FN matching (compute_statistics_jit, :62-118) — sequential
    bookkeeping over ≲300 boxes/frame, kept in plain numpy;
  * 11-point-style mAP sum over every 4th recall position (get_mAP,
    :443-447);
  * class min-overlaps vehicle 0.7/0.5, pedestrian & cyclist 0.5/0.25
    (:461-464).
"""

from __future__ import annotations

import numpy as np

from det3d_tpu.ops.rotated_iou import rotate_iou_eval_np

N_SAMPLE_PTS = 41
MIN_OVERLAPS = {
    "vehicle": [0.7, 0.5],
    "pedestrian": [0.5, 0.25],
    "cyclist": [0.5, 0.25],
}
NO_DETECTION = -10000000


def clean_data(gt_anno, dt_anno, current_class, num_points_thresh, range_thresh):
    """Ignore flags: -1 skip entirely, 0 count, 1 match-but-don't-count.
    Reference eval/eval.py:10-39."""
    cls = current_class.lower()
    ignored_gt, ignored_dt = [], []
    num_valid_gt = 0
    for i in range(len(gt_anno["name"])):
        if gt_anno["name"][i].lower() != cls:
            ignored_gt.append(-1)
        elif gt_anno["num_points"][i] == 0:
            ignored_gt.append(-1)
        elif not np.hypot(gt_anno["location"][i][0], gt_anno["location"][i][1]) < range_thresh:
            ignored_gt.append(-1)
        elif gt_anno["num_points"][i] > num_points_thresh:
            ignored_gt.append(0)
            num_valid_gt += 1
        else:
            ignored_gt.append(1)
    for i in range(len(dt_anno["name"])):
        if dt_anno["name"][i].lower() == cls and np.hypot(
            dt_anno["location"][i][0], dt_anno["location"][i][1]
        ) < range_thresh:
            ignored_dt.append(0)
        else:
            ignored_dt.append(-1)
    return num_valid_gt, np.array(ignored_gt, np.int64), np.array(ignored_dt, np.int64)


def get_thresholds(scores: np.ndarray, num_gt: int, num_sample_pts: int = N_SAMPLE_PTS):
    """Adaptive recall-spaced score thresholds (reference eval/eval.py:42-59)."""
    scores = np.sort(scores)[::-1]
    current_recall = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)) and i < len(scores) - 1:
            continue
        thresholds.append(score)
        current_recall += 1 / (num_sample_pts - 1.0)
    return np.array(thresholds)


def compute_statistics(overlaps, ignored_gt, ignored_det, dt_scores,
                       min_overlap, thresh=0.0, compute_fp=False):
    """Greedy per-frame matching (reference eval/eval.py:62-118).

    overlaps: (num_dt, num_gt)."""
    det_size = len(ignored_det)
    gt_size = len(ignored_gt)
    assigned = np.zeros(det_size, bool)
    ignored_threshold = (dt_scores < thresh) if compute_fp else np.zeros(det_size, bool)

    tp = fp = fn = 0
    thresholds = []
    for i in range(gt_size):
        if ignored_gt[i] == -1:
            continue
        det_idx = -1
        valid_detection = NO_DETECTION
        max_overlap = 0.0
        for j in range(det_size):
            if ignored_det[j] == -1 or assigned[j] or ignored_threshold[j]:
                continue
            overlap = overlaps[j, i]
            if not compute_fp and overlap > min_overlap and dt_scores[j] > valid_detection:
                det_idx = j
                valid_detection = dt_scores[j]
            elif compute_fp and overlap > min_overlap and overlap > max_overlap:
                max_overlap = overlap
                det_idx = j
                valid_detection = 1
        if valid_detection == NO_DETECTION and ignored_gt[i] == 0:
            fn += 1
        elif valid_detection != NO_DETECTION and ignored_gt[i] == 1:
            assigned[det_idx] = True
        elif valid_detection != NO_DETECTION:
            tp += 1
            thresholds.append(dt_scores[det_idx])
            assigned[det_idx] = True
    if compute_fp:
        fp = int(np.sum(~assigned & (ignored_det != -1) & ~ignored_threshold))
    return tp, fp, fn, np.array(thresholds)


def _frame_overlaps(gt_annos, dt_annos, metric):
    """Per-frame (num_dt, num_gt) rotated overlap matrices, device-computed.

    The reference batches frames into 50 parts for its CUDA kernel
    (calculate_iou_partly_lidar, eval/eval.py:238-287); we batch all frames
    into one padded device call per eval for the same reason (kernel launch
    amortization) but keep the per-frame API."""
    overlaps = []
    for gt, dt in zip(gt_annos, dt_annos):
        if len(gt["name"]) == 0 or len(dt["name"]) == 0:
            overlaps.append(np.zeros((len(dt["name"]), len(gt["name"])), np.float64))
            continue
        # lidar frame, -yaw convention as the reference (eval.py:252, :262)
        def boxes_of(a, three_d):
            loc = a["location"]
            dims = a["dimensions"]
            rots = a["rotation_y"]
            if three_d:
                return np.concatenate([loc, dims, -rots[..., None]], 1)
            return np.concatenate([loc[:, :2], dims[:, :2], -rots[..., None]], 1)

        if metric == "bev":
            ov = rotate_iou_eval_np(boxes_of(dt, False), boxes_of(gt, False), -1)
        elif metric == "3d":
            from det3d_tpu.ops.rotated_iou import d3_iou_lidar
            import jax.numpy as jnp

            ov = np.asarray(
                d3_iou_lidar(
                    jnp.asarray(boxes_of(dt, True), jnp.float32),
                    jnp.asarray(boxes_of(gt, True), jnp.float32),
                )
            )
        else:
            raise ValueError(metric)
        overlaps.append(ov.astype(np.float64))
    return overlaps


def eval_class_ap(gt_annos, dt_annos, class_names, metric,
                  num_points_thresh, range_thresh, overlaps=None):
    assert len(gt_annos) == len(dt_annos)
    if overlaps is None:
        overlaps = _frame_overlaps(gt_annos, dt_annos, metric)

    num_class = len(class_names)
    num_overlap = len(next(iter(MIN_OVERLAPS.values())))
    precision = np.zeros([num_class, num_overlap, N_SAMPLE_PTS])
    recall = np.zeros([num_class, num_overlap, N_SAMPLE_PTS])

    for m, current_class in enumerate(class_names):
        ignored_gts, ignored_dets, dt_score_list = [], [], []
        total_num_valid_gt = 0
        for gt, dt in zip(gt_annos, dt_annos):
            nv, ig, idt = clean_data(gt, dt, current_class, num_points_thresh, range_thresh)
            ignored_gts.append(ig)
            ignored_dets.append(idt)
            dt_score_list.append(dt["score"].astype(np.float32))
            total_num_valid_gt += nv

        for k, min_overlap in enumerate(MIN_OVERLAPS[current_class]):
            all_thresholds = []
            for i in range(len(gt_annos)):
                *_, th = compute_statistics(
                    overlaps[i], ignored_gts[i], ignored_dets[i], dt_score_list[i],
                    min_overlap, thresh=0.0, compute_fp=False,
                )
                all_thresholds += th.tolist()
            if total_num_valid_gt == 0:
                continue
            thresholds = get_thresholds(np.array(all_thresholds), total_num_valid_gt)
            pr = np.zeros([len(thresholds), 3])
            for i in range(len(gt_annos)):
                for t, thresh in enumerate(thresholds):
                    tp, fp, fn, _ = compute_statistics(
                        overlaps[i], ignored_gts[i], ignored_dets[i], dt_score_list[i],
                        min_overlap, thresh=thresh, compute_fp=True,
                    )
                    pr[t, 0] += tp
                    pr[t, 1] += fp
                    pr[t, 2] += fn
            for i in range(len(thresholds)):
                recall[m, k, i] = pr[i, 0] / (pr[i, 0] + pr[i, 2])
                precision[m, k, i] = pr[i, 0] / (pr[i, 0] + pr[i, 1])
            for i in range(len(thresholds)):
                precision[m, k, i] = np.max(precision[m, k, i:], axis=-1)
    return {"recall": recall, "precision": precision}


def get_map(prec: np.ndarray) -> np.ndarray:
    """Sum precision at every 4th recall position / 11 * 100
    (reference eval/eval.py:443-447)."""
    sums = 0
    for i in range(0, prec.shape[-1], 4):
        sums = sums + prec[..., i]
    return sums / 11 * 100


def get_official_eval_result(gt_annos, dt_annos, class_names, range_thresh,
                             num_point_threshold: int = 5, overlaps_cache: dict | None = None):
    """BEV + 3D mAP table with the reference's formatting
    (reference eval/eval.py:461-483).

    `overlaps_cache`: optional dict reused across calls (e.g. a range
    sweep) to avoid recomputing the rotated-IoU matrices — the device-heavy
    part — per threshold; the reference recomputes them every call
    (train.py:260-270)."""
    results = []
    eval_str = ""
    for metric in ("bev", "3d"):
        eval_str += "\n#### Metric: %s, num_points > %d and range < %.2f\n" % (
            metric, num_point_threshold, range_thresh,
        )
        overlaps = None
        if overlaps_cache is not None:
            if metric not in overlaps_cache:
                overlaps_cache[metric] = _frame_overlaps(gt_annos, dt_annos, metric)
            overlaps = overlaps_cache[metric]
        ret = eval_class_ap(
            gt_annos, dt_annos, class_names, metric, num_point_threshold,
            range_thresh, overlaps=overlaps,
        )
        m_ap = get_map(ret["precision"])
        results.append(m_ap)
        for i, cls in enumerate(class_names):
            eval_str += cls + ":\t"
            for j, iou in enumerate(MIN_OVERLAPS[cls]):
                eval_str += "@%.2f %.4f\t" % (iou, m_ap[i][j])
            eval_str += "\n"
    return results, eval_str
