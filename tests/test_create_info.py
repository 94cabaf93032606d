"""End-to-end `create_info` over a fabricated KITTI-layout split.

The parsing pieces have direct reference-parity coverage
(tests/test_reference_parity.py::test_label_parse_matches_reference); this
drives the full directory walk the `cli create-info` entry point runs:
calib parse → camera→lidar conversion → per-box point counting → pickle.
"""

import pickle

import numpy as np
import pytest

from det3d_tpu.data.create_info import create_info

# canonical KITTI-style velo→cam: cam_x = -ly, cam_y = -lz, cam_z = lx
VELO2CAM_34 = "0 -1 0 0 0 0 -1 0 1 0 0 0"
IDENT_34 = "1 0 0 0 0 1 0 0 0 0 1 0"
IDENT_33 = "1 0 0 0 1 0 0 0 1"


def _write_cloud(path, rng):
    """50 points: 20 inside the gt box (lidar (10, 0, -1), l=4 w=1.6 h=1.5,
    yaw -pi/2 after the KITTI ry conversion), 30 far away. The membership
    z-window is the reference's live quirk (z − h/2, z + h/2) — stored z
    treated as CENTER (see data/augment.points_in_rbbox_np docstring)."""
    pts = np.zeros((50, 4), np.float32)
    pts[:20, 0] = 10.0 + rng.uniform(-0.5, 0.5, 20)
    pts[:20, 1] = rng.uniform(-1.2, 1.2, 20)  # box length lies along y after yaw
    pts[:20, 2] = -1.0 + rng.uniform(-0.7, 0.6, 20)
    pts[20:, 0] = 40.0 + rng.uniform(0, 5, 30)
    pts[20:, 1] = 20.0
    pts[20:, 2] = 0.0
    pts.tofile(path)


@pytest.fixture()
def kitti_root(tmp_path):
    root = tmp_path / "train"
    for d in ("velodyne", "calib", "label_2"):
        (root / d).mkdir(parents=True)
    rng = np.random.RandomState(0)
    _write_cloud(root / "velodyne" / "000000.bin", rng)
    calib = "\n".join(
        [f"P{i}: {IDENT_34}" for i in range(4)]
        + [f"R0_rect: {IDENT_33}", f"Tr_velo_to_cam: {VELO2CAM_34}",
           f"Tr_imu_to_velo: {IDENT_34}"]
    )
    (root / "calib" / "000000.txt").write_text(calib + "\n")
    # type trunc occl alpha bbox(4) hwl(3) cam-xyz(3) ry
    # cam (0, 1, 10) → lidar (10, 0, -1) under VELO2CAM
    (root / "label_2" / "000000.txt").write_text(
        "Car 0.0 0 0.0 100 100 200 200 1.5 1.6 4.0 0.0 1.0 10.0 0.0\n"
    )
    return root


def test_kitti_walk(kitti_root):
    infos = create_info(kitti_root)
    assert len(infos) == 1
    info = infos[0]
    assert info["image_idx"] == 0
    assert info["velodyne_path"] == "velodyne/000000.bin"
    for key in ("calib/P0", "calib/R0_rect", "calib/Tr_velo_to_cam"):
        assert info[key].shape == (4, 4)
    a = info["annos"]
    assert list(a["name"]) == ["Car"]
    np.testing.assert_allclose(a["dimensions"][0], [4.0, 1.6, 1.5])  # hwl→lwh
    np.testing.assert_allclose(a["location"][0], [10.0, 0.0, -1.0], atol=1e-6)
    # ry=0 → limit_period(1.5π) = -0.5π
    np.testing.assert_allclose(a["rotation_y"][0], -0.5 * np.pi, atol=1e-6)
    assert int(a["num_points"][0]) == 20  # exactly the in-box points
    assert int(a["difficulty"][0]) >= 20  # enlarged box ⊇ box
    assert a["index"].tolist() == [0] and a["group_ids"].tolist() == [0]
    # the pickle is what cli create-info ships to the dataset loader
    with open(kitti_root / "data_info.pkl", "rb") as f:
        assert len(pickle.load(f)) == 1


def test_waymo_variant(tmp_path):
    root = tmp_path / "train"
    for d in ("velodyne", "calib", "label_all"):
        (root / d).mkdir(parents=True)
    _write_cloud(root / "velodyne" / "000007.bin", np.random.RandomState(1))
    # waymo calib carries an extra line at index 4 that the parser skips
    calib = "\n".join(
        [f"P{i}: {IDENT_34}" for i in range(4)]
        + ["SKIPPED: 0", f"R0_rect: {IDENT_33}", f"Tr_velo_to_cam: {IDENT_34}",
           f"Tr_imu_to_velo: {IDENT_34}"]
    )
    (root / "calib" / "000007.txt").write_text(calib + "\n")
    # waymo labels are already lidar-frame; rotation passes through
    (root / "label_all" / "000007.txt").write_text(
        "vehicle 0.0 0 0.0 0 0 0 0 1.5 1.6 4.0 10.0 0.0 -1.0 0.3\n"
    )
    infos = create_info(root, waymo=True)
    a = infos[0]["annos"]
    np.testing.assert_allclose(a["location"][0], [10.0, 0.0, -1.0])
    np.testing.assert_allclose(a["rotation_y"][0], 0.3)
    assert infos[0]["image_idx"] == 7


def test_lidar_only_and_missing_labels(tmp_path):
    """No image/ calib/ label dirs at all: index by velodyne, no annos."""
    root = tmp_path / "train"
    (root / "velodyne").mkdir(parents=True)
    _write_cloud(root / "velodyne" / "000003.bin", np.random.RandomState(2))
    infos = create_info(root)
    assert len(infos) == 1 and "annos" not in infos[0]


def test_dataset_resolves_split_relative_paths(tmp_path):
    """Multi-split layout (the reference's train_info convention:
    data_root/<split>/data_info.pkl with velodyne/ NEXT TO each pickle):
    DetectionDataset must resolve our create_info's split-relative
    velodyne_path against the info pickle's directory — joining data_root
    alone breaks every split but the root itself (round-4 file-pipeline
    drive caught this)."""
    from det3d_tpu.config import load_config
    from det3d_tpu.data.create_info import create_info
    from det3d_tpu.data.dataset import DetectionDataset

    root = tmp_path
    rng = np.random.RandomState(0)
    for split in ("train", "eval"):
        (root / split / "velodyne").mkdir(parents=True)
        (root / split / "label_all").mkdir()
        _write_cloud(root / split / "velodyne" / "000000.bin", rng)
        (root / split / "label_all" / "000000.txt").write_text(
            "vehicle 0.0 0 0.0 0 0 0 0 1.5 1.6 4.0 3.0 0.0 -1.0 0.3\n"
        )
        create_info(root / split, waymo=True)

    cfg = load_config({
        "data_root": str(root), "max_points": 4096,
        "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
        "voxel_size": [1.0, 1.0, 11.0], "max_voxels": 64,
        "max_num_points": 5,
    })
    ds = DetectionDataset(
        cfg, ["train/data_info.pkl", "eval/data_info.pkl"],
        training=False,
    )
    assert len(ds) == 2
    for i in range(2):
        pts = ds.load_points(ds.infos[i])
        assert pts.shape[1] == 4 and len(pts) > 0
