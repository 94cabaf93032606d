import numpy as np
import pytest

from det3d_tpu.ops.voxelize import VoxelizerSpec, voxelize
import np_ref


def make_spec(max_voxels=64, max_num_points=5, grid=(8, 8, 1)):
    return VoxelizerSpec(
        voxel_size=(1.0, 1.0, 10.0),
        offset=(0.0, 0.0, -5.0),
        grid_size=grid,
        max_voxels=max_voxels,
        max_num_points=max_num_points,
    )


def run_both(points, spec, n=None, fcfs=True):
    n = points.shape[0] if n is None else n
    max_points = 256
    padded = np.zeros((max_points, points.shape[1]), np.float32)
    padded[: points.shape[0]] = points
    out = voxelize(np.asarray(padded), np.int32(n), spec, fcfs=fcfs)
    ref = np_ref.voxelize_ref(
        points[:n], spec.voxel_size, spec.offset, spec.grid_size,
        spec.max_voxels, spec.max_num_points,
    )
    return out, ref


def random_points(n, seed=0, lo=-1.0, hi=9.0):
    r = np.random.RandomState(seed)
    pts = np.zeros((n, 4), np.float32)
    pts[:, :2] = r.uniform(lo, hi, (n, 2))
    pts[:, 2] = r.uniform(-4, 4, n)
    pts[:, 3] = r.uniform(0, 1, n)
    return pts


class TestExactParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_no_caps_binding(self, seed):
        pts = random_points(200, seed)
        spec = make_spec(max_voxels=128, max_num_points=16)
        out, (v_ref, c_ref, n_ref, num_ref) = run_both(pts, spec)
        num = int(out.voxel_num)
        assert num == num_ref
        np.testing.assert_array_equal(np.asarray(out.coors[:num]), c_ref)
        np.testing.assert_array_equal(np.asarray(out.num_points_per_voxel[:num]), n_ref)
        np.testing.assert_allclose(np.asarray(out.voxels[:num]), v_ref, atol=0)
        # padding slots stay inert
        assert np.all(np.asarray(out.coors[num:]) == -1)
        assert np.all(np.asarray(out.num_points_per_voxel[num:]) == 0)
        assert np.all(np.asarray(out.voxels[num:]) == 0)

    def test_point_cap_binding(self):
        """More points per pillar than max_num_points: first-come kept."""
        pts = random_points(220, 3, lo=0.0, hi=4.0)  # dense: few cells, many pts
        spec = make_spec(max_voxels=64, max_num_points=3)
        out, (v_ref, c_ref, n_ref, num_ref) = run_both(pts, spec)
        num = int(out.voxel_num)
        assert num == num_ref
        np.testing.assert_array_equal(np.asarray(out.coors[:num]), c_ref)
        np.testing.assert_array_equal(np.asarray(out.num_points_per_voxel[:num]), n_ref)
        np.testing.assert_allclose(np.asarray(out.voxels[:num]), v_ref, atol=0)

    def test_voxel_cap_binding_same_pillar_set(self):
        """More pillars than max_voxels: fcfs keeps the reference's pillar
        set & order (contents may differ post-break — documented)."""
        pts = random_points(240, 4)
        spec = make_spec(max_voxels=10, max_num_points=16)
        out, (v_ref, c_ref, n_ref, num_ref) = run_both(pts, spec)
        num = int(out.voxel_num)
        assert num == num_ref == 10
        np.testing.assert_array_equal(np.asarray(out.coors[:num]), c_ref)

    def test_out_of_range_points_dropped(self):
        pts = np.array(
            [
                [0.5, 0.5, 0.0, 1.0],
                [-3.0, 0.5, 0.0, 1.0],   # x < range
                [0.5, 11.0, 0.0, 1.0],   # y > range
                [0.5, 0.5, 7.0, 1.0],    # z > range
                [3.5, 3.5, 0.0, 2.0],
            ],
            np.float32,
        )
        spec = make_spec()
        out, (v_ref, c_ref, n_ref, num_ref) = run_both(pts, spec)
        assert int(out.voxel_num) == num_ref == 2
        np.testing.assert_array_equal(np.asarray(out.coors[:2]), c_ref)

    def test_num_points_truncation(self):
        """Rows beyond num_points must be ignored even if in range."""
        pts = random_points(100, 5)
        spec = make_spec(max_voxels=128, max_num_points=16)
        out, (v_ref, c_ref, n_ref, num_ref) = run_both(pts, spec, n=50)
        assert int(out.voxel_num) == num_ref
        np.testing.assert_allclose(
            np.asarray(out.voxels[: int(out.voxel_num)]), v_ref, atol=0
        )

    def test_empty_cloud(self):
        pts = np.zeros((0, 4), np.float32)
        spec = make_spec()
        padded = np.zeros((256, 4), np.float32)
        out = voxelize(np.asarray(padded), np.int32(0), spec)
        assert int(out.voxel_num) == 0
        assert np.all(np.asarray(out.coors) == -1)


class TestNonFcfsEquivalence:
    def test_same_content_different_order(self):
        """fcfs=False must produce the same pillar *set* (and per-pillar
        contents) when the cap doesn't bind."""
        pts = random_points(200, 6)
        spec = make_spec(max_voxels=128, max_num_points=8)
        a = voxelize_pad(pts, spec, fcfs=True)
        b = voxelize_pad(pts, spec, fcfs=False)
        assert int(a.voxel_num) == int(b.voxel_num)
        na = int(a.voxel_num)

        def key(coors):
            return coors[:, 0] * 64 + coors[:, 1] * 8 + coors[:, 2]

        ka = np.argsort(key(np.asarray(a.coors[:na])))
        kb = np.argsort(key(np.asarray(b.coors[:na])))
        np.testing.assert_array_equal(np.asarray(a.coors)[ka], np.asarray(b.coors)[kb])
        np.testing.assert_allclose(np.asarray(a.voxels)[ka], np.asarray(b.voxels)[kb])


def voxelize_pad(points, spec, fcfs):
    padded = np.zeros((256, points.shape[1]), np.float32)
    padded[: points.shape[0]] = points
    return voxelize(np.asarray(padded), np.int32(points.shape[0]), spec, fcfs=fcfs)
