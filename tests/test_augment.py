"""Augmentation invariants (data/augment.py).

The reference's augmentation is untested numba (reference
framework/augmentation.py); these tests pin the geometric invariants the
vectorized rewrite must satisfy.
"""

import numpy as np
import pytest

from det3d_tpu.data import augment as agm


def scene(seed=0, n_boxes=6, n_points=2000):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((n_boxes, 7), np.float32)
    boxes[:, :2] = rng.uniform(-30, 30, (n_boxes, 2))
    boxes[:, 2] = -1.5
    boxes[:, 3:6] = rng.uniform(1.5, 5, (n_boxes, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
    points = np.zeros((n_points, 4), np.float32)
    points[:, :2] = rng.uniform(-40, 40, (n_points, 2))
    points[:, 2] = rng.uniform(-2, 2, n_points)
    points[:, 3] = rng.uniform(0, 1, n_points)
    return boxes, points


class TestCollision:
    def test_disjoint_boxes_no_collision(self):
        a = agm.box2d_corners_np(np.array([[0.0, 0, 4, 2, 0.3]]))
        b = agm.box2d_corners_np(np.array([[20.0, 0, 4, 2, -0.5]]))
        assert not agm.box_collision_test_np(a, b)[0, 0]

    def test_overlapping_boxes_collide(self):
        a = agm.box2d_corners_np(np.array([[0.0, 0, 4, 2, 0.0]]))
        b = agm.box2d_corners_np(np.array([[1.0, 0.5, 4, 2, 0.7]]))
        assert agm.box_collision_test_np(a, b)[0, 0]

    def test_containment_detected(self):
        """No edge crossings but full containment must still collide."""
        a = agm.box2d_corners_np(np.array([[0.0, 0, 10, 10, 0.0]]))
        b = agm.box2d_corners_np(np.array([[0.0, 0, 1, 1, 0.3]]))
        assert agm.box_collision_test_np(a, b)[0, 0]
        assert agm.box_collision_test_np(b, a)[0, 0]

    def test_matches_bruteforce_on_random_pairs(self):
        rng = np.random.RandomState(3)
        boxes = np.zeros((40, 5))
        boxes[:, :2] = rng.uniform(-12, 12, (40, 2))
        boxes[:, 2:4] = rng.uniform(1, 6, (40, 2))
        boxes[:, 4] = rng.uniform(-np.pi, np.pi, 40)
        corners = agm.box2d_corners_np(boxes)
        got = agm.box_collision_test_np(corners, corners)
        # brute force: sample points in box i, test membership in j (coarse)
        import np_ref

        for i in range(0, 40, 7):
            for j in range(0, 40, 5):
                if i == j:
                    continue
                # np_ref corners use the iou-kernel rotation convention
                # (transposed); negate yaw to match box2d_corners_np
                bi = boxes[i].copy()
                bj = boxes[j].copy()
                bi[4] = -bi[4]
                bj[4] = -bj[4]
                inter = np_ref.rotated_intersection_ref(bi, bj)
                if inter > 1e-3:
                    assert got[i, j], (i, j, inter)
                elif inter == 0.0:
                    # disjoint (touching boxes are convention-dependent)
                    pass


class TestGlobalTransforms:
    def test_rotation_preserves_ranges_and_consistency(self):
        boxes, points = scene(0)
        b2, p2 = agm.global_rotation(boxes.copy(), points.copy(), np.random.RandomState(0))
        # ranges preserved (pure rotation)
        np.testing.assert_allclose(
            np.linalg.norm(p2[:, :3], axis=1),
            np.linalg.norm(points[:, :3], axis=1),
            rtol=1e-5,
        )

    def test_flip_involution(self):
        boxes, points = scene(1)

        class AlwaysFlip:
            def random_sample(self):
                return 1.0  # random_flip flips when sample > 0.5

        orig_boxes, orig_points = boxes.copy(), points.copy()
        b2, p2 = agm.random_flip(boxes.copy(), points.copy(), AlwaysFlip())
        np.testing.assert_allclose(b2[:, 1], -orig_boxes[:, 1])
        np.testing.assert_allclose(b2[:, 6], -orig_boxes[:, 6])
        np.testing.assert_allclose(p2[:, 1], -orig_points[:, 1])

    def test_scaling_scales_points_in_box_consistently(self):
        """Points inside a gt box must remain inside after anisotropic
        scaling (the dims/yaw re-fit guarantees this approximately)."""
        boxes = np.array([[5.0, 3.0, -1.5, 4.0, 2.0, 1.8, 0.6]], np.float32)
        rng = np.random.RandomState(0)
        inside = agm.points_in_rbbox_np(
            np.concatenate(
                [rng.uniform(3, 7, (500, 1)), rng.uniform(1, 5, (500, 1)),
                 rng.uniform(-1.4, -0.1, (500, 1)), np.zeros((500, 1))], 1
            ).astype(np.float32),
            boxes,
        )
        pts = np.concatenate(
            [rng.uniform(3, 7, (500, 1)), rng.uniform(1, 5, (500, 1)),
             rng.uniform(-1.4, -0.1, (500, 1)), np.zeros((500, 1))], 1
        ).astype(np.float32)
        mask_before = agm.points_in_rbbox_np(pts, boxes)[:, 0]
        b2, p2 = agm.global_scaling(boxes.copy(), pts.copy(), rng)
        mask_after = agm.points_in_rbbox_np(p2, b2)[:, 0]
        # allow a tiny boundary flake fraction from the yaw/dims re-fit
        flipped = (mask_before != mask_after).mean()
        assert flipped < 0.05, flipped


class TestNoisePerObject:
    def test_points_follow_their_boxes(self):
        boxes, _ = scene(2, n_boxes=4, n_points=0)
        # plant points at each box center
        pts = np.zeros((4, 4), np.float32)
        pts[:, :3] = boxes[:, :3] + [0, 0, 0.5]
        before = boxes.copy()
        agm.noise_per_object(boxes, pts, rng=np.random.RandomState(0))
        moved = np.abs(boxes[:, :3] - before[:, :3]).sum(1) + np.abs(boxes[:, 6] - before[:, 6])
        # for each moved box, its planted point must have moved with it
        for i in range(4):
            if moved[i] > 1e-6:
                np.testing.assert_allclose(
                    pts[i, :2] - boxes[i, :2], [0, 0], atol=0.2
                )

    def test_no_new_collisions_created(self):
        boxes, points = scene(4, n_boxes=8)
        agm.noise_per_object(boxes, points, rng=np.random.RandomState(1))
        corners = agm.box2d_corners_np(boxes[:, [0, 1, 3, 4, 6]].astype(np.float64))
        coll = agm.box_collision_test_np(corners, corners)
        np.fill_diagonal(coll, False)
        # boxes that didn't overlap initially must not overlap after
        b0, _ = scene(4, n_boxes=8)
        c0 = agm.box2d_corners_np(b0[:, [0, 1, 3, 4, 6]].astype(np.float64))
        coll0 = agm.box_collision_test_np(c0, c0)
        np.fill_diagonal(coll0, False)
        new = coll & ~coll0
        assert not new.any()

    def test_empty_boxes_noop(self):
        boxes = np.zeros((0, 7), np.float32)
        pts = np.random.rand(10, 4).astype(np.float32)
        agm.noise_per_object(boxes, pts)  # must not raise


class TestFullChain:
    def test_augment_sample_shapes_and_finiteness(self):
        boxes, points = scene(5)
        b2, p2 = agm.augment_sample(points.copy(), boxes.copy(), rng=np.random.RandomState(2))
        assert b2.shape == boxes.shape and p2.shape == points.shape
        assert np.isfinite(b2).all() and np.isfinite(p2).all()


class TestDeviceAugmentWiring:
    def test_device_yaw_wrap_matches_host_period(self):
        # the device filter+wrap step must use the host path's 2π wrap
        # (dataset._limit_period_np): a π wrap would alias headings that
        # differ by π and flip the direction targets (targets.py dir_targets)
        import jax
        import jax.numpy as jnp

        from det3d_tpu.train.trainer import Trainer
        from helpers import small_cfg

        tr = Trainer(small_cfg(), device_global_augment=True, aug_seed=0)
        yaw = 2.5  # > π/2: a π wrap would move it to 2.5 - π < 0
        boxes = jnp.array([[0.0, 0.0, -1.0, 4.0, 2.0, 1.6, yaw]], jnp.float32)
        pts = jnp.zeros((8, 4), jnp.float32)
        valid = jnp.ones((1,), bool)
        # stub the transform to identity so only the filter+wrap step acts
        # (the real chain's scale re-fit arctan — a reference-faithful quirk,
        # global_scaling_v2 — already collapses yaw into (-π/2, π/2], which
        # would mask a wrong wrap period here)
        import det3d_tpu.data.augment as dagm

        orig = dagm.apply_global_augment
        dagm.apply_global_augment = lambda p, b, params: (p, b)
        try:
            _, b2, v2 = tr._device_augment_one(
                pts, boxes, valid, jax.random.PRNGKey(0)
            )
        finally:
            dagm.apply_global_augment = orig
        assert bool(v2[0])
        # 2.5 rad is already in [-π, π): the 2π wrap leaves it alone
        np.testing.assert_allclose(float(b2[0, 6]), yaw, atol=1e-6)

    def test_host_chain_global_transforms_switch(self):
        # global_transforms=False (device-augment mode) keeps only the
        # per-object noise: with zero gt boxes, points must be untouched
        points = np.random.RandomState(7).rand(100, 4).astype(np.float32) * 10
        boxes = np.zeros((0, 7), np.float32)
        b2, p2 = agm.augment_sample(
            points.copy(), boxes, rng=np.random.RandomState(0),
            global_transforms=False,
        )
        np.testing.assert_array_equal(p2, points)
        # with the globals on, the same call transforms the points
        _, p3 = agm.augment_sample(
            points.copy(), boxes, rng=np.random.RandomState(0)
        )
        assert not np.array_equal(p3, points)

    def test_trainer_device_augment_step(self):
        # integration: a Trainer(device_global_augment=True) step runs with
        # finite loss and actually augments (loss differs from the
        # unaugmented step on the same batch and init)
        import jax

        from det3d_tpu.train.trainer import Trainer, host_batch
        from helpers import small_cfg

        cfg = small_cfg(batch_size=1)
        rng = np.random.RandomState(3)
        pts = np.concatenate(
            [rng.uniform(-7, 7, (400, 2)), rng.uniform(-2, 6, (400, 1)),
             rng.uniform(0, 1, (400, 1))], 1).astype(np.float32)
        gt = np.array([[0.0, 0.0, -1.5, 4.6, 2.1, 1.8, 0.3]], np.float32)
        batch = jax.device_put(host_batch(cfg, [
            {"points": pts, "gt_boxes": gt, "gt_classes": np.array([1], np.int32)}
        ]))

        tr_aug = Trainer(cfg, device_global_augment=True, aug_seed=5)
        tr_plain = Trainer(cfg)
        _, loss_aug, _ = tr_aug.train_step_jit(
            tr_aug.init_state(jax.random.PRNGKey(0)), batch
        )
        _, loss_plain, _ = tr_plain.train_step_jit(
            tr_plain.init_state(jax.random.PRNGKey(0)), batch
        )
        assert np.isfinite(float(loss_aug["loss"]))
        assert float(loss_aug["loss"]) != float(loss_plain["loss"])


class TestDeviceGlobalAugment:
    """The on-device jnp global transforms must match the host numpy chain
    elementwise when driven with identical parameters."""

    def _host_apply(self, points, boxes, p):
        pts, bxs = points.copy().astype(np.float64), boxes.copy().astype(np.float64)
        if p["flip"]:
            bxs[:, 1] = -bxs[:, 1]
            bxs[:, 6] = -bxs[:, 6]
            pts[:, 1] = -pts[:, 1]
        for ang, axis in ((p["pitch"], 1), (p["roll"], 0), (p["yaw"], 2)):
            pts[:, :3] = agm.rotation_points_single_angle_np(pts[:, :3], ang, axis=axis)
            bxs[:, :3] = agm.rotation_points_single_angle_np(bxs[:, :3], ang, axis=axis)
        bxs[:, 6] += p["yaw"]
        sx, sy, sz = p["scale"]
        pts[:, :3] *= p["scale"]
        bxs[:, :3] *= p["scale"]
        yaw = bxs[:, 6]
        bxs[:, 3] *= np.sqrt((sx * np.cos(yaw)) ** 2 + (sy * np.sin(yaw)) ** 2)
        bxs[:, 4] *= np.sqrt((sx * np.sin(yaw)) ** 2 + (sy * np.cos(yaw)) ** 2)
        bxs[:, 5] *= sz
        bxs[:, 6] = np.arctan(np.tan(yaw) * (sy / sx))
        pts[:, :3] += p["translate"]
        bxs[:, :3] += p["translate"]
        return pts, bxs

    @pytest.mark.parametrize("flip", [False, True])
    def test_matches_host_with_identical_params(self, flip):
        import jax.numpy as jnp

        boxes, points = scene(7)
        params = {
            "flip": jnp.asarray(flip),
            "pitch": jnp.float32(0.03),
            "roll": jnp.float32(-0.02),
            "yaw": jnp.float32(0.4),
            "scale": jnp.asarray([1.05, 0.93, 1.02], jnp.float32),
            "translate": jnp.asarray([0.1, -0.2, 0.05], jnp.float32),
        }
        dp, db = agm.apply_global_augment(
            jnp.asarray(points), jnp.asarray(boxes), params
        )
        hp, hb = self._host_apply(
            points, boxes,
            {k: np.asarray(v) for k, v in params.items()},
        )
        np.testing.assert_allclose(np.asarray(dp), hp, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(db), hb, rtol=1e-4, atol=1e-4)

    def test_sampled_end_to_end_jits(self):
        import jax

        boxes, points = scene(8)
        fn = jax.jit(agm.global_augment_device)
        p2, b2 = fn(points, boxes, jax.random.PRNGKey(3))
        assert p2.shape == points.shape and b2.shape == boxes.shape
        assert np.isfinite(np.asarray(p2)).all() and np.isfinite(np.asarray(b2)).all()
