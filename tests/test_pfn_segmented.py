"""Segmented PFN (ops/pfn_segmented.py) equivalence vs the dense PFN module.

The segmented path must reproduce `PFN(voxelize(points))` with frozen batch
statistics exactly (up to f32 reassociation in float32 configs): same
decoration, same first-P-points cap, same relu(BN(0)) padding floor, same
empty-slot zeros, and the same fcfs pillar selection when the V cap binds.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import random_cloud, small_cfg


def _randomized_variables(det, seed=0):
    """init_variables with non-trivial PFN BN stats/affine so the fold is
    actually exercised (fresh init has mean=0, var=1, scale=1, bias=0)."""
    v = det.init_variables(jax.random.PRNGKey(seed))
    r = np.random.RandomState(seed + 1)
    v = jax.tree_util.tree_map(lambda x: x, v)  # shallow copy-able pytree
    bn = v["batch_stats"]["pfn"]["pfn_bn"]
    f = bn["mean"].shape[0]
    bs = dict(v["batch_stats"])
    pfn_bs = dict(bs["pfn"])
    pfn_bs["pfn_bn"] = {
        "mean": jnp.asarray(r.normal(0, 0.5, f), jnp.float32),
        "var": jnp.asarray(r.uniform(0.3, 2.0, f), jnp.float32),
    }
    bs["pfn"] = pfn_bs
    params = dict(v["params"])
    pfn_p = dict(params["pfn"])
    pfn_p["pfn_bn"] = {
        "scale": jnp.asarray(r.uniform(0.5, 1.5, f), jnp.float32),
        "bias": jnp.asarray(r.normal(0, 0.3, f), jnp.float32),
    }
    params["pfn"] = pfn_p
    return {"params": params, "batch_stats": bs}


def _dense_features(det, variables, pts, n):
    from det3d_tpu.models.pointpillars import PFN

    frame, _ = det.preprocess(jnp.asarray(pts), jnp.asarray(n))
    feats = PFN(
        voxel_size=tuple(det.cfg.voxel_size),
        offset=tuple(det.cfg.detection_offset),
        compute_dtype=jnp.dtype(det.cfg.compute_dtype),
        name="pfn",
    ).apply(
        {
            "params": variables["params"]["pfn"],
            "batch_stats": variables["batch_stats"]["pfn"],
        },
        frame.voxels[None],
        frame.num_points_per_voxel[None],
        frame.coors[None],
        False,
    )
    return np.asarray(feats[0]), frame


def _segmented_features(det, variables, pts, n):
    from det3d_tpu.ops.pfn_segmented import (
        fold_from_variables,
        pillar_features_segmented,
    )

    fold = fold_from_variables(
        variables, num_point_features=det.cfg.num_point_features
    )
    feats, coors, counts, voxel_num = pillar_features_segmented(
        jnp.asarray(pts),
        jnp.asarray(n),
        det.spec,
        fold,
        compute_dtype=jnp.dtype(det.cfg.compute_dtype),
    )
    return np.asarray(feats), coors, counts, voxel_num


@pytest.mark.parametrize(
    "seed,npts",
    [(0, 240), (1, 17), (2, 256)],
)
def test_matches_dense_pfn(seed, npts):
    from det3d_tpu.pipeline import Detector

    cfg = small_cfg()
    det = Detector(cfg)
    v = _randomized_variables(det, seed)
    pts, n = det.pad_points(random_cloud(npts, seed=seed))

    dense, frame = _dense_features(det, v, pts, n)
    seg, coors, counts, voxel_num = _segmented_features(det, v, pts, n)

    np.testing.assert_array_equal(np.asarray(frame.coors), np.asarray(coors))
    np.testing.assert_array_equal(
        np.asarray(frame.num_points_per_voxel), np.asarray(counts)
    )
    np.testing.assert_array_equal(
        np.asarray(frame.voxel_num), np.asarray(voxel_num)
    )
    np.testing.assert_allclose(dense, seg, rtol=2e-5, atol=2e-5)


def test_point_cap_and_full_pillars():
    """Cells with more than max_num_points points: only the first P (arrival
    order) contribute, and FULL pillars get no relu(BN(0)) floor."""
    from det3d_tpu.pipeline import Detector

    cfg = small_cfg(max_num_points=4)
    det = Detector(cfg)
    v = _randomized_variables(det, 3)
    r = np.random.RandomState(3)
    # 40 points in one cell, plus a sprinkle elsewhere
    pts = np.zeros((cfg.max_points, 4), np.float32)
    pts[:40, :2] = 0.3 + r.uniform(0, 0.4, (40, 2))
    pts[:40, 2] = r.uniform(-1, 1, 40)
    pts[:40, 3] = r.uniform(0, 1, 40)
    pts[40:80] = random_cloud(40, seed=9)[:40]
    n = np.int32(80)

    dense, frame = _dense_features(det, v, pts, n)
    seg, coors, counts, _ = _segmented_features(det, v, pts, n)
    np.testing.assert_array_equal(np.asarray(frame.coors), np.asarray(coors))
    np.testing.assert_allclose(dense, seg, rtol=2e-5, atol=2e-5)


def test_voxel_cap_binding_keeps_fcfs_selection():
    """More occupied cells than max_voxels: the kept pillar set (and slot
    order) must be the dense fcfs voxelizer's."""
    from det3d_tpu.pipeline import Detector

    cfg = small_cfg(max_points=512, max_voxels=24)
    det = Detector(cfg)
    v = _randomized_variables(det, 4)
    pts, n = det.pad_points(random_cloud(400, seed=11))  # ~16x16 cells occupied

    dense, frame = _dense_features(det, v, pts, n)
    seg, coors, counts, voxel_num = _segmented_features(det, v, pts, n)
    np.testing.assert_array_equal(np.asarray(frame.coors), np.asarray(coors))
    np.testing.assert_allclose(dense, seg, rtol=1e-4, atol=1e-4)


def test_empty_and_out_of_range_clouds():
    from det3d_tpu.pipeline import Detector

    cfg = small_cfg()
    det = Detector(cfg)
    v = _randomized_variables(det, 5)
    for pts_np, n in [
        (np.zeros((cfg.max_points, 4), np.float32), np.int32(0)),
        (np.full((cfg.max_points, 4), 500.0, np.float32), np.int32(64)),
    ]:
        seg, coors, counts, voxel_num = _segmented_features(det, v, pts_np, n)
        assert int(voxel_num) == 0
        assert not np.any(seg)
        assert np.all(np.asarray(coors) == -1)


def test_detector_end_to_end_flag_parity():
    """Detector(pfn_segmented=True) must produce the same candidates as the
    dense path (float32 config: only reassociation-level drift allowed)."""
    from det3d_tpu.pipeline import Detector

    cfg = small_cfg()
    det_d = Detector(cfg)
    det_s = Detector(cfg.replace(pfn_segmented=True))
    v = _randomized_variables(det_d, 6)
    pts, n = det_d.pad_points(random_cloud(220, seed=13))

    out_d = det_d.infer_candidates(v, jnp.asarray(pts), jnp.asarray(n))
    out_s = det_s.infer_candidates(v, jnp.asarray(pts), jnp.asarray(n))
    for a, b in zip(jax.tree.leaves(out_d), jax.tree.leaves(out_s)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_window_tables_block_boundaries():
    """Direct kernel test (interpret): windows crossing the block boundary
    must be exact — tiny block_rows forces every few segments across a
    halo edge, including full-cap and over-cap (dead-row) segments."""
    from det3d_tpu.kernels.pfn_pallas import pfn_window_tables

    r = np.random.RandomState(7)
    p_cap, c, f = 6, 4, 16
    # hand-built sorted structure: segment lengths 1..14 (over-cap included)
    seg_lens = r.randint(1, 15, size=60)
    n = int(seg_lens.sum())
    sp = r.randn(n, c).astype(np.float32)
    wlen = np.zeros(n, np.int32)
    heads, pos = [], 0
    for L in seg_lens:
        heads.append(pos)
        k = min(int(L), p_cap)
        wlen[pos : pos + L] = np.maximum(pos + k - np.arange(pos, pos + L), -3)
        pos += L
    wp = r.randn(c, f).astype(np.float32)

    m, s = pfn_window_tables(
        jnp.asarray(sp), jnp.asarray(wlen), jnp.asarray(wp), p_cap,
        out_dtype=jnp.float32, block_rows=16, interpret=True,
    )
    u = sp @ wp
    for h, L in zip(heads, seg_lens):
        k = min(int(L), p_cap)
        np.testing.assert_allclose(
            np.asarray(m)[h], u[h : h + k].max(0), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s)[h, :3], sp[h : h + k, :3].sum(0), rtol=1e-5, atol=1e-5
        )
