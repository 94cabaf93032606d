import numpy as np
import pytest

from det3d_tpu.anchors import build_anchors
from det3d_tpu.targets import make_target_assigner, pad_gt
from helpers import small_cfg
import np_ref


def make_gt(cfg, boxes_and_classes):
    boxes = np.array([b for b, _ in boxes_and_classes], np.float32).reshape(-1, 7)
    classes = np.array([c for _, c in boxes_and_classes], np.int32)
    return pad_gt(cfg, boxes, classes)


def spatial_mask(cfg, aset, flat_mask):
    """Flat anchor-major mask → the assigner's spatial (nch, fx, fy) form."""
    fms = cfg.feature_map_size
    return flat_mask.reshape(aset.num_channels, fms[0], fms[1])


def assign_ref_all(cfg, aset, anchors_mask, gt_boxes, gt_classes):
    """Run the numpy oracle per class and reinterleave into the
    location-major channel layout (like the reference's loop over
    class_masks, adapted to the flat-order divergence)."""
    nch = aset.num_channels
    mask_ch = anchors_mask.reshape(nch, -1)
    labels_l, targets_l, weights_l, dir_l = [], [], [], []
    for ci, spec in enumerate(cfg.class_specs):
        c0, c1 = aset.class_channels[spec.name]
        mask = gt_classes == ci + 1
        lab, tgt, w, d = np_ref.assign_targets_ref(
            aset.anchors_by_class[spec.name],
            aset.anchors_bv_by_class[spec.name],
            mask_ch[c0:c1].reshape(-1),
            gt_boxes[mask], spec.matched_threshold, spec.unmatched_threshold,
        )
        labels_l.append(lab)
        targets_l.append(tgt)
        weights_l.append(w)
        dir_l.append(d)
    # anchor-major flat: per-class blocks concatenate directly
    return (
        np.concatenate(labels_l),
        np.concatenate(targets_l, axis=0),
        np.concatenate(weights_l),
        np.concatenate(dir_l),
    )


class TestTargets:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_vs_oracle_random(self, seed):
        cfg = small_cfg()
        aset = build_anchors(cfg)
        assigner = make_target_assigner(cfg, aset)
        r = np.random.RandomState(seed)

        gt_raw = np.zeros((5, 7), np.float32)
        gt_raw[:, :2] = r.uniform(-6, 6, (5, 2))
        gt_raw[:, 2] = r.uniform(-1, 1, 5)
        gt_raw[:, 3:6] = r.uniform(0.8, 5.0, (5, 3))
        gt_raw[:, 6] = r.uniform(-np.pi, np.pi, 5)
        gt_classes_raw = r.randint(1, 4, 5).astype(np.int32)

        anchors_mask = r.rand(aset.num_anchors) > 0.3

        boxes, classes, valid = pad_gt(cfg, gt_raw, gt_classes_raw)
        out = assigner(boxes, classes, valid, spatial_mask(cfg, aset, anchors_mask))

        # spatial outputs flatten row-major to the oracle's flat order
        ref = assign_ref_all(cfg, aset, anchors_mask, gt_raw, gt_classes_raw)
        np.testing.assert_array_equal(np.asarray(out.labels).reshape(-1), ref[0])
        np.testing.assert_allclose(
            np.asarray(out.bbox_targets).reshape(7, -1).T, ref[1], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(out.bbox_outside_weights).reshape(-1), ref[2]
        )
        np.testing.assert_array_equal(np.asarray(out.dir_targets).reshape(-1), ref[3])

    def test_no_gt_all_background(self):
        cfg = small_cfg()
        aset = build_anchors(cfg)
        assigner = make_target_assigner(cfg, aset)
        boxes, classes, valid = pad_gt(cfg, np.zeros((0, 7), np.float32), np.zeros((0,), np.int32))
        anchors_mask = np.ones(aset.num_anchors, bool)
        out = assigner(boxes, classes, valid, spatial_mask(cfg, aset, anchors_mask))
        assert (np.asarray(out.labels) == 0).all()
        assert np.asarray(out.bbox_targets).sum() == 0

    def test_masked_anchors_are_dont_care(self):
        cfg = small_cfg()
        aset = build_anchors(cfg)
        assigner = make_target_assigner(cfg, aset)
        gt = np.array([[0.0, 0.0, 0.0, 4.6, 2.1, 1.8, 0.0]], np.float32)
        boxes, classes, valid = pad_gt(cfg, gt, np.array([1], np.int32))
        anchors_mask = np.zeros(aset.num_anchors, bool)
        out = assigner(boxes, classes, valid, spatial_mask(cfg, aset, anchors_mask))
        assert (np.asarray(out.labels) == -1).all()

    def test_force_match_guarantees_positive(self):
        """Every valid gt with nonzero overlap gets at least one positive
        anchor even below the matched threshold."""
        cfg = small_cfg()
        aset = build_anchors(cfg)
        assigner = make_target_assigner(cfg, aset)
        # tiny vehicle → IoU with the 4.6x2.1 anchors is far below 0.6
        gt = np.array([[1.3, 0.7, 0.0, 0.9, 0.4, 1.0, 0.3]], np.float32)
        boxes, classes, valid = pad_gt(cfg, gt, np.array([1], np.int32))
        anchors_mask = np.ones(aset.num_anchors, bool)
        out = assigner(boxes, classes, valid, spatial_mask(cfg, aset, anchors_mask))
        c0, c1 = aset.class_channels["vehicle"]
        labels = np.asarray(out.labels)  # (nch, fx, fy)
        assert (labels[c0:c1] > 0).sum() >= 1
        ref = assign_ref_all(cfg, aset, anchors_mask, gt, np.array([1], np.int32))
        np.testing.assert_array_equal(labels.reshape(-1), ref[0])


class TestPallasMatcher:
    """The fused matrix-free Pallas matcher (kernels/matcher_pallas.py) must
    match the dense-IoU XLA path elementwise (interpret mode on CPU)."""

    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_xla_path(self, seed):
        import jax.numpy as jnp

        from det3d_tpu.kernels.matcher_pallas import assign_class_pallas
        from det3d_tpu.targets import _assign_one_class

        cfg = small_cfg()
        aset = build_anchors(cfg)
        r = np.random.RandomState(seed)

        gt_raw = np.zeros((6, 7), np.float32)
        gt_raw[:, :2] = r.uniform(-6, 6, (6, 2))
        gt_raw[:, 2] = r.uniform(-1, 1, 6)
        gt_raw[:, 3:6] = r.uniform(0.8, 5.0, (6, 3))
        gt_raw[:, 6] = r.uniform(-np.pi, np.pi, 6)
        classes_raw = r.randint(1, 4, 6).astype(np.int32)
        boxes, classes, valid = pad_gt(cfg, gt_raw, classes_raw)

        anchors_mask = r.rand(aset.num_anchors) > 0.3
        mask_ch = anchors_mask.reshape(-1, aset.num_channels)

        for ci, spec in enumerate(cfg.class_specs):
            c0, c1 = aset.class_channels[spec.name]
            cls_valid = jnp.asarray(valid & (classes == ci + 1))
            args = (
                jnp.asarray(aset.anchors_by_class[spec.name]),
                jnp.asarray(aset.anchors_bv_by_class[spec.name]),
                jnp.asarray(mask_ch[:, c0:c1].reshape(-1)),
                jnp.asarray(boxes),
                cls_valid,
                spec.matched_threshold,
                spec.unmatched_threshold,
            )
            ref = _assign_one_class(*args)
            got = assign_class_pallas(*args, interpret=True)
            np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
            np.testing.assert_allclose(
                np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-6, atol=1e-6
            )
            np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
            np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))

    def test_no_valid_gt(self):
        import jax.numpy as jnp

        from det3d_tpu.kernels.matcher_pallas import assign_class_pallas
        from det3d_tpu.targets import _assign_one_class

        cfg = small_cfg()
        aset = build_anchors(cfg)
        spec = cfg.class_specs[0]
        boxes, classes, valid = pad_gt(cfg, np.zeros((0, 7), np.float32), np.zeros(0, np.int32))
        mask = np.ones(aset.anchors_by_class[spec.name].shape[0], bool)
        args = (
            jnp.asarray(aset.anchors_by_class[spec.name]),
            jnp.asarray(aset.anchors_bv_by_class[spec.name]),
            jnp.asarray(mask),
            jnp.asarray(boxes),
            jnp.asarray(valid),
            spec.matched_threshold,
            spec.unmatched_threshold,
        )
        ref = _assign_one_class(*args)
        got = assign_class_pallas(*args, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        assert np.all(np.asarray(got[0]) == 0)  # empty gt → all background
        np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
