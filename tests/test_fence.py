"""The space-to-batch fence kernel (kernels/fence_pallas.py) must be a bit
-exact identity for every shape it can see: head predictions (B, K, A) on
the forward path and arbitrary flattened gradient leaves via fence_any."""

import jax
import jax.numpy as jnp
import numpy as np

from det3d_tpu.kernels.fence_pallas import _fence_impl, _pick_chunk, fence_any, s2b_fence


class TestFenceImpl:
    def test_identity_production_shape(self):
        # cls_preds at the 20cm geometry: (2, 1, 1_440_000)
        r = np.random.RandomState(0)
        x = jnp.asarray(r.randn(2, 1, 1_440_000).astype(np.float32))
        y = _fence_impl(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_identity_box_preds_shape(self):
        r = np.random.RandomState(1)
        x = jnp.asarray(r.randn(2, 7, 9 * 1024).astype(np.float32)).astype(jnp.bfloat16)
        y = _fence_impl(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_identity_non_divisible_last_dim(self):
        # 90 has no 128-multiple divisor → padded-chunk path
        r = np.random.RandomState(2)
        x = jnp.asarray(r.randn(1, 3, 90).astype(np.float32))
        y = _fence_impl(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_identity_large_non_divisible_last_dim(self):
        # 2,250,000 (= 9·500·500, a 1000²-grid cls_preds) has NO 128-multiple
        # divisor: must pad and chunk rather than take one ~9 MB full block
        r = np.random.RandomState(4)
        x = jnp.asarray(r.randn(1, 1, 2_250_000).astype(np.float32))
        y = _fence_impl(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_identity_5d_spatial_preds(self):
        # the spatial preds contract makes cls_preds (B, k, nch, fx, fy);
        # the fence must flatten the trailing dims, not crash (on-TPU train
        # regression caught in the round-3 review)
        r = np.random.RandomState(5)
        x5 = jnp.asarray(r.randn(2, 1, 9, 40, 40).astype(np.float32))
        y = _fence_impl(x5.reshape(x5.shape[0], 1, -1), interpret=True)
        np.testing.assert_array_equal(
            np.asarray(y).reshape(x5.shape), np.asarray(x5)
        )
        # off-TPU the public entry is a passthrough for any rank
        np.testing.assert_array_equal(np.asarray(s2b_fence(x5)), np.asarray(x5))

    def test_pick_chunk_bounds(self):
        # chunks are 128-multiple divisors capped at 256k elements (the
        # double-buffered in+out blocks must fit scoped VMEM; an uncapped
        # 1.44M-element block OOMed on chip); None when no divisor exists
        for a in (1_440_000, 36_864, 128, 5_760_000):
            c = _pick_chunk(a)
            assert a % c == 0
            assert c % 128 == 0 and c <= 256 * 1024
        for a in (90, 7, 2_250_000):
            assert _pick_chunk(a) is None

    def test_s2b_fence_cpu_passthrough_and_grad(self):
        # off-TPU the fence is a plain identity; the VJP passes cotangents
        x = jnp.arange(12.0).reshape(1, 3, 4)
        y, vjp = jax.vjp(s2b_fence, x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
        (gx,) = vjp(jnp.ones_like(y))
        np.testing.assert_array_equal(np.asarray(gx), 1.0)

    def test_fence_any_shapes(self):
        # gradient-leaf shapes: conv kernels, biases, scalars
        for shape in ((3, 3, 64, 64), (90,), (), (320, 90)):
            x = jnp.asarray(np.float32(np.random.RandomState(3).randn(*shape)))
            y = fence_any(x)
            np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
