import numpy as np

import jax.numpy as jnp

from det3d_tpu import losses


def _np_sigmoid(x):
    return 1 / (1 + np.exp(-x))


class TestFocal:
    def test_matches_definition(self):
        r = np.random.RandomState(0)
        logits = r.randn(2, 16, 1).astype(np.float32)
        targets = (r.rand(2, 16, 1) > 0.5).astype(np.float32)
        weights = r.rand(2, 16).astype(np.float32)
        out = np.asarray(losses.focal_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)))

        p = _np_sigmoid(logits)
        ce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
        p_t = targets * p + (1 - targets) * (1 - p)
        alpha_w = targets * 0.25 + (1 - targets) * 0.75
        expected = (1 - p_t) ** 2 * alpha_w * ce * weights[..., None]
        np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-5)


class TestSmoothL1:
    def test_piecewise(self):
        # sigma=3 → cutover at |x| = 1/9
        preds = jnp.asarray(np.array([[[0.05, 0.5]]], np.float32))
        targets = jnp.zeros((1, 1, 2))
        weights = jnp.ones((1, 1))
        out = np.asarray(losses.smooth_l1_loss(preds, targets, weights))
        np.testing.assert_allclose(out[0, 0, 0], 0.5 * (0.05 * 3) ** 2, rtol=1e-5)
        np.testing.assert_allclose(out[0, 0, 1], 0.5 - 0.5 / 9, rtol=1e-5)


class TestSinDifference:
    def test_identity(self):
        a = jnp.asarray(np.random.RandomState(0).randn(1, 4, 7).astype(np.float32))
        b = jnp.asarray(np.random.RandomState(1).randn(1, 4, 7).astype(np.float32))
        oa, ob = losses.add_sin_difference(a, b)
        # sin(a-b) = sin a cos b - cos a sin b: the split encodings subtract
        # to the true angle difference sine
        np.testing.assert_allclose(
            np.asarray(oa[..., -1] - ob[..., -1]),
            np.sin(np.asarray(a[..., -1]) - np.asarray(b[..., -1])),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(np.asarray(oa[..., :-1]), np.asarray(a[..., :-1]))


class TestLossWeights:
    def test_norm_by_num_positives(self):
        labels = jnp.asarray(np.array([[1, 1, 0, 0, 0, -1]], np.int32))
        cls_w, reg_w, cared = losses.prepare_loss_weights(labels)
        np.testing.assert_allclose(np.asarray(reg_w), [[0.5, 0.5, 0, 0, 0, 0]])
        np.testing.assert_allclose(np.asarray(cls_w), [[0.5, 0.5, 0.5, 0.5, 0.5, 0]])
        np.testing.assert_array_equal(np.asarray(cared), [[True] * 5 + [False]])


class TestTotalLoss:
    def test_finite_and_composed(self):
        r = np.random.RandomState(0)
        b, a = 2, 32
        preds = {
            "cls_preds": jnp.asarray(r.randn(b, 1, a).astype(np.float32)),
            "box_preds": jnp.asarray(r.randn(b, 7, a).astype(np.float32)),
            "dir_preds": jnp.asarray(r.randn(b, 2, a).astype(np.float32)),
        }
        labels = jnp.asarray(r.randint(-1, 2, (b, a)).astype(np.int32))
        reg = jnp.asarray(r.randn(b, 7, a).astype(np.float32))  # channel-major contract
        dirs = jnp.asarray(r.randint(0, 2, (b, a)).astype(np.int32))
        out = losses.detection_loss(preds, labels, reg, dirs)
        total = float(out["loss"])
        assert np.isfinite(total)
        np.testing.assert_allclose(
            total,
            float(out["cls_loss"]) + float(out["loc_loss"]) + 0.2 * float(out["dir_loss"]),
            rtol=1e-5,
        )
