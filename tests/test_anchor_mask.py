import numpy as np

from det3d_tpu.anchors import build_anchors
from det3d_tpu.config import load_config
from det3d_tpu.ops.anchor_mask import anchor_corner_cells, compute_anchors_mask
import np_ref


def small_cfg():
    return load_config(
        {
            "detection_range": [-8.0, -8.0, -2.5, 8.0, 8.0, 8.5],
            "voxel_size": [1.0, 1.0, 11.0],
            "max_voxels": 64,
            "max_num_points": 5,
        }
    )


class TestAnchorMask:
    def test_vs_oracle_random(self):
        r = np.random.RandomState(0)
        grid_xy = (16, 16)
        coors = np.full((64, 3), -1, np.int32)
        n = 20
        coors[:n, 0] = r.randint(0, 16, n)
        coors[:n, 1] = r.randint(0, 16, n)
        coors[:n, 2] = 0

        # random anchor lookup cells (minx<=maxx etc.)
        m = 200
        minx = r.randint(0, 15, m)
        miny = r.randint(0, 15, m)
        maxx = minx + r.randint(0, 16 - minx)
        maxy = miny + r.randint(0, 16 - miny)
        cells = np.stack([minx, miny, np.minimum(maxx, 15), np.minimum(maxy, 15)], -1).astype(np.int32)

        out = np.asarray(compute_anchors_mask(coors, cells, grid_xy))
        ref = np_ref.sat_anchor_mask_ref(coors[:n], grid_xy, cells)
        np.testing.assert_array_equal(out, ref)

    def test_empty_coors_all_false(self):
        coors = np.full((8, 3), -1, np.int32)
        cells = np.zeros((10, 4), np.int32)
        out = np.asarray(compute_anchors_mask(coors, cells, (16, 16)))
        assert not out.any()

    def test_full_config_pipeline(self):
        """Anchors over an occupied cell should unmask; far cells stay off."""
        cfg = small_cfg()
        aset = build_anchors(cfg)
        coors = np.full((cfg.max_voxels, 3), -1, np.int32)
        coors[0] = [8, 8, 0]  # center-ish cell
        out = np.asarray(
            compute_anchors_mask(coors, aset.corner_cells, (cfg.grid_size[0], cfg.grid_size[1]))
        )
        ref = np_ref.sat_anchor_mask_ref(
            coors[:1], (cfg.grid_size[0], cfg.grid_size[1]), aset.corner_cells
        )
        np.testing.assert_array_equal(out, ref)
        assert out.any() and not out.all()


class TestCornerCells:
    def test_clipping(self):
        bv = np.array([[-100.0, -100.0, 100.0, 100.0], [0.0, 0.0, 1.0, 1.0]], np.float32)
        cells = anchor_corner_cells(bv, (1.0, 1.0, 10.0), (-8.0, -8.0, -5.0), (16, 16, 1))
        np.testing.assert_array_equal(cells[0], [0, 0, 15, 15])
        np.testing.assert_array_equal(cells[1], [8, 8, 9, 9])


def test_separable_fast_path_matches_gather_path():
    """The row/col-take fast path must be bit-identical to the per-anchor
    SAT gather on the production anchor layout."""
    import jax.numpy as jnp
    import numpy as np

    from det3d_tpu.anchors import build_anchors
    from det3d_tpu.config import load_config
    from det3d_tpu.ops.anchor_mask import (
        anchors_mask_from_sat,
        anchors_mask_from_sat_separable,
        occupancy_sat,
    )

    cfg = load_config(
        {
            "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
            "voxel_size": [0.5, 0.5, 11.0],
        }
    )
    aset = build_anchors(cfg)
    assert aset.mask_index_vectors is not None, "production layout must be separable"

    rng = np.random.RandomState(0)
    nx, ny = cfg.grid_size[0], cfg.grid_size[1]
    coors = np.full((512, 3), -1, np.int32)
    n = 300
    coors[:n, 0] = rng.randint(0, nx, n)
    coors[:n, 1] = rng.randint(0, ny, n)
    coors[:n, 2] = 0

    sat = occupancy_sat(jnp.asarray(coors), (nx, ny))
    slow = np.asarray(anchors_mask_from_sat(sat, jnp.asarray(aset.corner_cells)))
    fast = np.asarray(anchors_mask_from_sat_separable(sat, aset.mask_index_vectors))
    # fast path emits the spatial (nch, fx, fy) form; row-major flatten is
    # the legacy flat anchor order the gather path produces
    fms = cfg.feature_map_size
    assert fast.shape == (aset.num_channels, fms[0], fms[1])
    assert slow.shape == (cfg.num_anchors,)
    assert slow.any() and not slow.all()
    np.testing.assert_array_equal(fast.reshape(-1), slow)
