"""End-to-end postprocess parity vs an independent numpy implementation.

Formalizes the reference's own de-facto test mechanism — `infer_v2/v3` run
the numpy and torch decode/NMS paths side by side and compare
(reference framework/inference.py:308-356, :603-611).
"""

import numpy as np
import pytest

import np_ref
from det3d_tpu.anchors import build_anchors
from det3d_tpu.data.augment import box2d_corners_np
from det3d_tpu.postprocess import PostProcessParams, make_postprocessor, to_annos
from helpers import small_cfg


def postprocess_ref(cfg, anchor_set, preds, anchors_mask, params):
    """Numpy reimplementation of the per-class pipeline
    (reference framework/inference.py:26-138)."""
    nch = anchor_set.num_channels
    cls_ch = preds["cls_preds"].reshape(nch, -1, 1)
    box_ch = preds["box_preds"].reshape(nch, -1, 7)
    dir_ch = preds["dir_preds"].reshape(nch, -1, 2)
    mask_ch = anchors_mask.reshape(nch, -1)
    out = []
    for spec in cfg.class_specs:
        c0, c1 = anchor_set.class_channels[spec.name]
        anchors = anchor_set.anchors_by_class[spec.name]
        cls_c = cls_ch[c0:c1].reshape(-1, 1)
        box_c = box_ch[c0:c1].reshape(-1, 7)
        dir_c = dir_ch[c0:c1].reshape(-1, 2)
        scores = 1 / (1 + np.exp(-cls_c.max(-1)))
        gate = mask_ch[c0:c1].reshape(-1) & (scores >= params.score_threshold)
        ms = np.where(gate, scores, -1.0)
        k = min(params.nms_pre_max_size, len(ms))
        idx = np.argsort(-ms, kind="stable")[:k]
        top = ms[idx]
        valid = top >= 0
        boxes = np_ref.box_decode_ref(box_c[idx], anchors[idx])
        dir_labels = dir_c[idx].argmax(-1).astype(bool)

        corners = box2d_corners_np(boxes[:, [0, 1, 3, 4, 6]])
        standup = np.concatenate([corners.min(1), corners.max(1)], -1)
        keep_idx = np_ref.nms_greedy_ref(
            standup[valid], top[valid], params.nms_iou_threshold, params.nms_post_max_size
        )
        keep = np.zeros(k, bool)
        keep[np.flatnonzero(valid)[keep_idx]] = True

        opp = (boxes[:, 6] > 0) ^ dir_labels
        yaw = boxes[:, 6] + np.where(opp, np.pi, 0.0)
        boxes[:, 6] = yaw - np.floor(yaw / (2 * np.pi) + 0.5) * 2 * np.pi

        cl = np.asarray(cfg.center_limit)
        keep &= np.any(boxes[:, :3] > cl[:3], 1) & np.any(boxes[:, 3:6] < cl[3:], 1)
        out.append((boxes[keep], top[keep]))
    return out


class TestParityDecode:
    @pytest.mark.parametrize("approx", [False, True])
    def test_parity_pair_matches_merged(self, approx):
        """decode_stage consumed per-column-parity pred pairs (the split-head
        path) must produce the same detections as the merged spatial form.
        Exact mode is bit-identical; bucketed mode is checked by re-running
        the merged path through the same bucket structure is NOT possible
        (bucket partitions differ), so approx=True only sanity-checks shapes
        and validity consistency."""
        import jax.numpy as jnp

        cfg = small_cfg()
        aset = build_anchors(cfg)
        params = PostProcessParams(approx_topk=approx)
        post = make_postprocessor(cfg, aset, params)

        rng = np.random.RandomState(4)
        nch = aset.num_channels
        fx, fy = cfg.feature_map_size[0], cfg.feature_map_size[1]
        preds = {
            "cls_preds": (rng.randn(1, nch, fx, fy) * 2 - 3).astype(np.float32),
            "box_preds": (rng.randn(7, nch, fx, fy) * 0.2).astype(np.float32),
            "dir_preds": rng.randn(2, nch, fx, fy).astype(np.float32),
        }
        mask = rng.rand(nch, fx, fy) > 0.3
        pair = {
            k: (jnp.asarray(v[..., 0::2]), jnp.asarray(v[..., 1::2]))
            for k, v in preds.items()
        }
        det_m = post({k: jnp.asarray(v) for k, v in preds.items()}, jnp.asarray(mask))
        det_p = post(pair, jnp.asarray(mask))
        if approx:
            assert np.asarray(det_p.valid).sum() > 0
            assert np.isfinite(np.asarray(det_p.boxes)[np.asarray(det_p.valid)]).all()
        else:
            for a, b in zip(det_m, det_p):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
                )


class TestStagedPostprocess:
    def test_stage_boundary_roundtrips(self):
        """The candidates pytree is the export/dispatch boundary
        (deploy/export.py serializes the two stages separately): finalizing
        candidates that crossed a host round-trip — losing weak types,
        tuple/list identity, device placement — must reproduce the direct
        result exactly, and the boundary stays small."""
        import jax
        import jax.numpy as jnp

        from det3d_tpu.pipeline import Detector
        from helpers import small_cfg, random_cloud

        det = Detector(small_cfg())
        v = det.init_variables(jax.random.PRNGKey(0))
        pts, n = det.pad_points(random_cloud(300, seed=11))
        cands = det.infer_candidates(v, jnp.asarray(pts), jnp.asarray(n))
        direct = det.infer(v, jnp.asarray(pts), jnp.asarray(n))

        host = jax.tree.map(np.asarray, cands)
        total_bytes = sum(a.nbytes for a in jax.tree.leaves(host))
        assert total_bytes < 2**20, "stage boundary must stay small"
        rt = jax.tree.map(jnp.asarray, host)
        staged = jax.jit(det.postprocess.finalize_stage)(rt)
        for a, b in zip(direct, staged):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBucketedTopK:
    def test_recall_and_order(self):
        """Bucketed top-k: sorted descending, indices consistent, recall on
        the true top-k ~ 1 - k/(2B) (here ~97%)."""
        import jax.numpy as jnp

        from det3d_tpu.postprocess import _bucketed_topk

        r = np.random.RandomState(0)
        n, k = 960_000, 1000
        scores = r.rand(n).astype(np.float32)
        top, idx = _bucketed_topk(jnp.asarray(scores), k)
        top, idx = np.asarray(top), np.asarray(idx)
        # returned values match the claimed indices, sorted descending
        np.testing.assert_allclose(top, scores[idx], rtol=0)
        assert (np.diff(top) <= 0).all()
        assert len(np.unique(idx)) == k
        # recall vs exact top-k
        exact = set(np.argpartition(scores, -k)[-k:].tolist())
        recall = len(exact.intersection(idx.tolist())) / k
        assert recall > 0.93, recall

    def test_top1_always_exact(self):
        import jax.numpy as jnp

        from det3d_tpu.postprocess import _bucketed_topk

        r = np.random.RandomState(3)
        scores = r.randn(160_000).astype(np.float32)
        top, idx = _bucketed_topk(jnp.asarray(scores), 1000)
        assert int(np.asarray(idx)[0]) == int(scores.argmax())
        assert float(np.asarray(top)[0]) == float(scores.max())


class TestPostprocessParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_vs_numpy_ref(self, seed):
        cfg = small_cfg()
        aset = build_anchors(cfg)
        params = PostProcessParams()
        post = make_postprocessor(cfg, aset, params)

        rng = np.random.RandomState(seed)
        na = cfg.num_anchors
        # logits scaled so a few hundred anchors pass the 0.05 gate
        preds = {
            "cls_preds": (rng.randn(na, 1) * 2 - 3).astype(np.float32),
            "box_preds": (rng.randn(na, 7) * 0.2).astype(np.float32),
            "dir_preds": rng.randn(na, 2).astype(np.float32),
        }
        mask = rng.rand(na) > 0.3

        # model contract: spatial channel-major (k, nch, fx, fy)
        nch = aset.num_channels
        fms = cfg.feature_map_size
        spatial = {
            k: v.T.reshape(-1, nch, fms[0], fms[1]) for k, v in preds.items()
        }
        det = post(spatial, mask.reshape(nch, fms[0], fms[1]))
        ref = postprocess_ref(cfg, aset, preds, mask, params)

        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        valid = np.asarray(det.valid)
        for ci, (ref_boxes, ref_scores) in enumerate(ref):
            got_boxes = boxes[ci][valid[ci]]
            got_scores = scores[ci][valid[ci]]
            assert got_boxes.shape == ref_boxes.shape, (
                ci, got_boxes.shape, ref_boxes.shape)
            # both sorted by descending score → direct comparison
            np.testing.assert_allclose(got_scores, ref_scores, atol=1e-5)
            np.testing.assert_allclose(got_boxes, ref_boxes, atol=2e-4)

    def test_empty_mask_yields_no_detections(self):
        cfg = small_cfg()
        aset = build_anchors(cfg)
        post = make_postprocessor(cfg, aset)
        rng = np.random.RandomState(0)
        na = cfg.num_anchors
        preds = {
            "cls_preds": rng.randn(na, 1).astype(np.float32),
            "box_preds": rng.randn(na, 7).astype(np.float32) * 0.1,
            "dir_preds": rng.randn(na, 2).astype(np.float32),
        }
        nch = aset.num_channels
        fms = cfg.feature_map_size
        spatial = {
            k: v.T.reshape(-1, nch, fms[0], fms[1]) for k, v in preds.items()
        }
        det = post(spatial, np.zeros((nch, fms[0], fms[1]), bool))
        assert not np.asarray(det.valid).any()
        annos = to_annos(cfg, det)
        assert len(annos["name"]) == 0
