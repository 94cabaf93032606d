"""Native async point-cloud loader (runtime/pointcloud_loader.cc via ctypes)."""

import numpy as np
import pytest

from det3d_tpu.data.native_loader import AsyncPointCloudLoader, available

pytestmark = pytest.mark.skipif(not available(), reason="native loader not built")


@pytest.fixture(scope="module")
def bin_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bins")
    rng = np.random.RandomState(0)
    refs = []
    for i in range(12):
        a = rng.randn(rng.randint(100, 3000), 4).astype(np.float32)
        a.tofile(tmp / f"{i}.bin")
        refs.append(a)
    return tmp, refs


def test_order_content_padding(bin_dir):
    tmp, refs = bin_dir
    with AsyncPointCloudLoader(4000, 4, queue_depth=3, num_threads=2) as ld:
        for i in range(len(refs)):
            ld.submit(tmp / f"{i}.bin")
        ld.finish()
        for i, ref in enumerate(refs):
            pts, n = ld.next()
            assert n == len(ref)
            assert np.array_equal(pts[:n], ref)
            assert np.all(pts[n:] == 0)
        assert ld.next() is None


def test_truncation_to_max_points(bin_dir):
    tmp, _ = bin_dir
    big = np.random.RandomState(1).randn(5000, 4).astype(np.float32)
    big.tofile(tmp / "big.bin")
    with AsyncPointCloudLoader(3000, 4) as ld:
        ld.submit(tmp / "big.bin")
        ld.finish()
        pts, n = ld.next()
        assert n == 3000
        assert np.array_equal(pts, big[:3000])


def test_shuffle_deterministic_and_permutes(bin_dir):
    tmp, refs = bin_dir

    def run():
        with AsyncPointCloudLoader(4000, 4, shuffle=True, seed=7) as ld:
            ld.submit(tmp / "0.bin")
            ld.finish()
            return ld.next()

    s1, n1 = run()
    s2, n2 = run()
    assert n1 == n2 == len(refs[0])
    assert np.array_equal(s1, s2)
    assert not np.array_equal(s1[:n1], refs[0])
    assert np.array_equal(np.sort(s1[:n1], axis=0), np.sort(refs[0], axis=0))


def test_missing_file_raises_unless_opted_out(bin_dir):
    tmp, _ = bin_dir
    with AsyncPointCloudLoader(1000, 4) as ld:
        ld.submit(tmp / "does_not_exist.bin")
        ld.finish()
        with pytest.raises(FileNotFoundError, match="does_not_exist"):
            ld.next()
    with AsyncPointCloudLoader(1000, 4) as ld:
        ld.submit(tmp / "does_not_exist.bin")
        ld.finish()
        pts, n = ld.next(missing_ok=True)
        assert n == 0
        assert np.all(pts == 0)


def test_deep_pipeline_backpressure(bin_dir):
    """More submissions than ring slots, consumed late — no deadlock."""
    tmp, refs = bin_dir
    with AsyncPointCloudLoader(4000, 4, queue_depth=2, num_threads=4) as ld:
        for _round in range(3):
            for i in range(len(refs)):
                ld.submit(tmp / f"{i}.bin")
        ld.finish()
        count = 0
        while (item := ld.next()) is not None:
            pts, n = item
            assert n == len(refs[count % len(refs)])
            count += 1
        assert count == 3 * len(refs)
