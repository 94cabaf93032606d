"""Compile-check every Pallas kernel on the real TPU at production shapes.

Interpret-mode tests validate semantics but NOT Mosaic compilability (e.g.
unaligned dynamic slices pass interpret and fail the TPU compiler). Run this
after touching anything under kernels/:

    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/tpu_kernel_check.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    print("backend:", jax.default_backend())
    r = np.random.RandomState(0)

    # --- scatter_to_bev_pallas at the 20cm production shape -----------------
    from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_pallas

    v, c, nx, ny = 16000, 64, 800, 800
    feats = jnp.asarray(r.randn(1, v, c), jnp.bfloat16)
    coors = np.full((1, v, 3), -1, np.int32)
    cells = r.choice(nx * ny, 12000, replace=False)
    coors[0, :12000, 0] = cells // ny
    coors[0, :12000, 1] = cells % ny
    coors[0, :12000, 2] = 0
    out = scatter_to_bev_pallas(feats, jnp.asarray(coors), (nx, ny))
    out.block_until_ready()
    got = np.asarray(out[0], np.float32)
    want = np.zeros((nx * ny, c), np.float32)
    want[cells] = np.asarray(feats[0, :12000], np.float32)
    np.testing.assert_array_equal(got.reshape(nx * ny, c), want)
    print("scatter_to_bev_pallas: OK")

    # --- s2d variant (packed block0 entry path) ------------------------------
    from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_s2d_pallas

    out = scatter_to_bev_s2d_pallas(feats, jnp.asarray(coors), (nx, ny))
    out.block_until_ready()
    got = np.asarray(out[0], np.float32).reshape((nx // 2) * (ny // 2), 4, c)
    want = np.zeros(((nx // 2) * (ny // 2), 4, c), np.float32)
    cx, cy = cells // ny, cells % ny
    want[(cx // 2) * (ny // 2) + cy // 2, (cx % 2) * 2 + cy % 2] = np.asarray(
        feats[0, :12000], np.float32
    )
    np.testing.assert_array_equal(got, want)
    out = scatter_to_bev_s2d_pallas(feats, jnp.asarray(coors), (nx, ny), False, True)
    out.block_until_ready()
    got_wm = np.asarray(out[0], np.float32).reshape((nx // 2) * (ny // 2), 4, c)
    np.testing.assert_array_equal(got_wm, want)
    print("scatter_to_bev_s2d_pallas (+w_major): OK")

    # --- s2d kernel at the 10cm production grid (1600², w_major) ----------
    v10, n10 = 20000, 1600
    feats10 = jnp.asarray(r.randn(1, v10, c), jnp.bfloat16)
    coors10 = np.full((1, v10, 3), -1, np.int32)
    cells10 = r.choice((n10 * n10) // 4, 18000, replace=False)  # clustered
    coors10[0, :18000, 0] = cells10 // n10
    coors10[0, :18000, 1] = cells10 % n10
    coors10[0, :18000, 2] = 0
    out = scatter_to_bev_s2d_pallas(
        feats10, jnp.asarray(coors10), (n10, n10), False, True
    )
    out.block_until_ready()
    got10 = np.asarray(out[0], np.float32).reshape((n10 // 2) * (n10 // 2), 4, c)
    want10 = np.zeros(((n10 // 2) * (n10 // 2), 4, c), np.float32)
    cx10, cy10 = cells10 // n10, cells10 % n10
    want10[(cx10 // 2) * (n10 // 2) + cy10 // 2, (cx10 % 2) * 2 + cy10 % 2] = (
        np.asarray(feats10[0, :18000], np.float32)
    )
    np.testing.assert_array_equal(got10, want10)
    print("scatter_to_bev_s2d_pallas @10cm grid: OK")

    # --- blocked-halo s2d (Config.block0_blocked) at the 10cm shape --------
    from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_s2d_blocked

    nblk, ht, hb = 8, 4, 3
    out = scatter_to_bev_s2d_blocked(
        feats10, jnp.asarray(coors10), (n10, n10), nblk, (ht, hb)
    )
    out.block_until_ready()
    blk = np.asarray(out[0], np.float32)     # (nblk, rb+7, 800, 4c)
    nx2 = n10 // 2
    rb = nx2 // nblk
    pad10 = np.zeros((nx2 + ht + hb, nx2, 4 * c), np.float32)
    pad10[ht : ht + nx2] = want10.reshape(nx2, nx2, 4 * c)
    for k in range(nblk):
        np.testing.assert_array_equal(
            blk[k].reshape(rb + ht + hb, nx2, 4 * c),
            pad10[k * rb : k * rb + rb + ht + hb],
        )
    print("scatter_to_bev_s2d_blocked @10cm grid: OK (halos exact)")

    # --- batch-2 (training shape): Mosaic's last-two-block-dims rule differs
    # for B>1 arrays — a b=1-only check once passed while the train step
    # failed to lower -----------------------------------------------------
    feats2 = jnp.concatenate([feats, feats * 2], axis=0)
    coors2 = np.concatenate([coors, coors], axis=0)
    out = scatter_to_bev_s2d_pallas(feats2, jnp.asarray(coors2), (nx, ny))
    out.block_until_ready()
    got2 = np.asarray(out[1], np.float32).reshape((nx // 2) * (ny // 2), 4, c)
    np.testing.assert_array_equal(got2, want * 2)
    out = scatter_to_bev_pallas(feats2, jnp.asarray(coors2), (nx, ny))
    out.block_until_ready()
    want_flat = np.zeros((nx * ny, c), np.float32)
    want_flat[cells] = np.asarray(feats[0, :12000], np.float32)
    np.testing.assert_array_equal(np.asarray(out[0], np.float32).reshape(nx * ny, c), want_flat)
    np.testing.assert_array_equal(np.asarray(out[1], np.float32).reshape(nx * ny, c), want_flat * 2)
    print("scatter batch-2: OK")

    # --- non-production-divisor grid (round-2 advisor): nrows that no large
    # tile divides must still pick a sublane-aligned tile and pad rows -------
    nxo, nyo = 30, 30  # nrows=900: NO multiple-of-8 divides → tile=8 + row pad
    vo = 640
    feats_o = jnp.asarray(r.randn(1, vo, c), jnp.bfloat16)
    coors_o = np.full((1, vo, 3), -1, np.int32)
    cells_o = r.choice(nxo * nyo, 500, replace=False)
    coors_o[0, :500, 0] = cells_o // nyo
    coors_o[0, :500, 1] = cells_o % nyo
    coors_o[0, :500, 2] = 0
    out = scatter_to_bev_pallas(feats_o, jnp.asarray(coors_o), (nxo, nyo))
    got = np.asarray(out[0], np.float32).reshape(nxo * nyo, c)
    want_o = np.zeros((nxo * nyo, c), np.float32)
    want_o[cells_o] = np.asarray(feats_o[0, :500], np.float32)
    np.testing.assert_array_equal(got, want_o)
    out = scatter_to_bev_s2d_pallas(feats_o, jnp.asarray(coors_o), (nxo, nyo))
    got_o = np.asarray(out[0], np.float32).reshape((nxo // 2) * (nyo // 2), 4, c)
    want_so = np.zeros(((nxo // 2) * (nyo // 2), 4, c), np.float32)
    cxo, cyo = cells_o // nyo, cells_o % nyo
    want_so[(cxo // 2) * (nyo // 2) + cyo // 2, (cxo % 2) * 2 + cyo % 2] = (
        np.asarray(feats_o[0, :500], np.float32)
    )
    np.testing.assert_array_equal(got_o, want_so)
    print("scatter odd-grid (30x30, tile-8 row pad): OK")

    # --- assign_class_pallas at the vehicle-class production shape -----------
    from det3d_tpu.kernels.matcher_pallas import assign_class_pallas

    ac, g = 960000, 64
    anchors = np.zeros((ac, 7), np.float32)
    anchors[:, 0] = r.uniform(-80, 80, ac)
    anchors[:, 1] = r.uniform(-80, 80, ac)
    anchors[:, 2] = -1.0
    anchors[:, 3:6] = [5.58, 2.28, 2.13]
    anchors[:, 6] = 0.0
    gt = np.zeros((g, 7), np.float32)
    gt[:, 0] = r.uniform(-60, 60, g)
    gt[:, 1] = r.uniform(-60, 60, g)
    gt[:, 2] = -1.0
    gt[:, 3:6] = [5.0, 2.2, 2.0]
    gt_valid = np.ones((g,), bool)
    gt_valid[40:] = False
    from det3d_tpu.ops import geometry

    abv = geometry.rbbox2d_to_near_bbox(jnp.asarray(anchors)[:, jnp.array([0, 1, 3, 4, 6])])
    mask = jnp.asarray(r.rand(ac) < 0.3)
    lab, tgt, wts, dirs = assign_class_pallas(
        jnp.asarray(anchors), abv, mask, jnp.asarray(gt), jnp.asarray(gt_valid),
        0.6, 0.45,
    )
    jax.block_until_ready((lab, tgt, wts, dirs))
    print("assign_class_pallas: OK  pos=", int((np.asarray(lab) > 0).sum()))

    # --- NMS kernel at production shape --------------------------------------
    from det3d_tpu.kernels.nms_pallas import greedy_nms_pallas

    n = 1024
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = r.uniform(0, 700, n)
    boxes[:, 1] = r.uniform(0, 700, n)
    boxes[:, 2] = boxes[:, 0] + r.uniform(5, 30, n)
    boxes[:, 3] = boxes[:, 1] + r.uniform(5, 30, n)
    keep = greedy_nms_pallas(
        jnp.asarray(boxes), jnp.ones((n,), bool), 0.5, 100
    )
    jax.block_until_ready(keep)
    print("greedy_nms_pallas: OK")

    # --- s2b fence at the train-step shapes ----------------------------------
    from det3d_tpu.kernels.fence_pallas import fence_any, s2b_fence

    x = jnp.asarray(r.randn(2, 1, 9, 400, 400), jnp.bfloat16)  # cls_preds b=2
    y = s2b_fence(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    for shape in ((3, 3, 256, 256), (90,), (320, 90)):  # gradient leaves
        g = jnp.asarray(r.randn(*shape), jnp.float32)
        np.testing.assert_array_equal(np.asarray(fence_any(g)), np.asarray(g))
    # padded-chunk path: chunk axes with NO 128-multiple divisor (the 1000²
    # grid's 9·500·500 cls map, and a small 90-lane tail) must pad + slice
    for shape in ((1, 3, 90), (1, 1, 2_250_000)):
        x = jnp.asarray(r.randn(*shape), jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(s2b_fence(x)), np.asarray(x))
    print("s2b_fence / fence_any (+padded chunks): OK")

    print("ALL KERNELS COMPILE AND RUN ON", jax.default_backend())


if __name__ == "__main__":
    main()
