"""Dataset: pickled info lists + .bin point clouds → static-shape samples.

Counterpart of the reference's `GenericDataset` / `InferData` (reference:
framework/dataset.py:13-231). Key redesign: `__getitem__` only does host IO
and augmentation — voxelization, anchor masking, and target assignment all
moved on-device (see pipeline.Detector / targets.make_target_assigner), so
the host data plane is trivially cheap and the training step consumes raw
padded points + gt boxes.

Class remapping matches the reference exactly (dataset.py:45-84):
car/truck/bus → vehicle, person → pedestrian, bicycle/motorbike → cyclist;
gt with zero lidar points are dropped.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from det3d_tpu.config import Config
from det3d_tpu.data import augment as agm
from det3d_tpu.utils.npmath import limit_period_np
from det3d_tpu.ops import geometry  # noqa: F401  (device twin of the filters below)

_CLASS_REMAP = {
    "car": "vehicle",
    "truck": "vehicle",
    "bus": "vehicle",
    "person": "pedestrian",
    "bicycle": "cyclist",
    "motorbike": "cyclist",
}


def remap_class_names(infos: list[dict]) -> list[dict]:
    """In-place raw→detect class remap + zero-point gt drop
    (reference framework/dataset.py:45-84, train.py:165-184 changeInfo)."""
    for info in infos:
        annos = info.get("annos")
        if annos is None or len(annos.get("name", ())) == 0:
            continue
        if "num_points" in annos:
            keep = annos["num_points"] > 0
            for key in annos:
                annos[key] = annos[key][keep]
        names = annos["name"].astype("<U16")
        for raw, mapped in _CLASS_REMAP.items():
            names[names == raw] = mapped
        annos["name"] = names
    return infos


def _filter_gt_outside_range_np(gt_boxes, bv_range):
    corners = agm.box2d_corners_np(gt_boxes[:, [0, 1, 3, 4, 6]].astype(np.float64))
    cx = np.array(
        [[bv_range[0], bv_range[1]], [bv_range[0], bv_range[3]],
         [bv_range[2], bv_range[3]], [bv_range[2], bv_range[1]]]
    )
    flat = corners.reshape(-1, 2)
    inside = agm._points_in_quad(flat, cx)
    return inside.reshape(-1, 4).any(axis=1)


class DetectionDataset:
    """Map-style dataset over info pickles."""

    def __init__(
        self,
        cfg: Config,
        info_paths,
        training: bool = True,
        augment: bool = True,
        seed: int | None = None,
        device_global_augment: bool = False,
    ):
        self.cfg = cfg
        self.data_root = Path(cfg.data_root)
        self.training = training
        self.augment = augment and training
        # when the trainer applies the global transforms on device
        # (Trainer(device_global_augment=True)), the host chain keeps only
        # the per-object noise so nothing is augmented twice
        self.device_global_augment = device_global_augment
        self.rng = np.random.RandomState(seed)
        self.infos: list[dict] = []
        for p in info_paths:
            with open(self.data_root / p, "rb") as f:
                split = pickle.load(f)
            # data paths may be data_root-relative (the reference's
            # create_info convention, create_info.py:58) OR split-dir-
            # relative (ours: "velodyne/<id>.bin" next to data_info.pkl) —
            # remember each pickle's directory so both layouts resolve
            info_dir = str((self.data_root / p).parent)
            for info in split:
                info.setdefault("_info_dir", info_dir)
            self.infos += split
        remap_class_names(self.infos)

    def __len__(self) -> int:
        return len(self.infos)

    def resolve_path(self, info: dict, key: str = "velodyne_path") -> Path:
        """data_root-relative first (reference layout), else relative to the
        info pickle's own directory (our create_info's split layout)."""
        path = self.data_root / info[key]
        if not path.exists() and "_info_dir" in info:
            alt = Path(info["_info_dir"]) / info[key]
            if alt.exists():
                return alt
        return path

    def load_points(self, info: dict) -> np.ndarray:
        path = self.resolve_path(info)
        return np.fromfile(path, dtype=np.float32).reshape(-1, self.cfg.num_point_features)

    def __getitem__(self, idx: int) -> dict:
        info = self.infos[idx]
        points = self.load_points(info)
        sample = {"points": points, "info": info}
        if not self.training:
            return sample

        annos = info["annos"]
        names = annos["name"]
        class_mask = np.array([n in self.cfg.detect_class for n in names], bool)
        gt_names = names[class_mask]
        gt_classes = np.array(
            [list(self.cfg.detect_class).index(n) + 1 for n in gt_names], np.int32
        )
        gt_boxes = np.concatenate(
            [
                annos["location"][class_mask],
                annos["dimensions"][class_mask],
                annos["rotation_y"][class_mask][..., None],
            ],
            axis=1,
        ).astype(np.float32)

        if self.augment:
            gt_boxes, points = agm.augment_sample(
                points, gt_boxes, rng=self.rng,
                global_transforms=not self.device_global_augment,
            )

        # range filter + yaw wrap (reference dataset.py:136-143). With
        # device_global_augment the exact filter must NOT run here: the
        # reference order is transform-then-filter, and the trainer applies
        # the same filter on device after its global transforms
        # (Trainer._device_augment_one). A conservative radius pre-filter
        # still runs so certainly-unreachable boxes don't occupy the fixed
        # max_gt_boxes slots (host_batch truncates): the global transforms
        # shrink a corner radius by at most GLOBAL_SCALE_MIN and a translation
        # clipped to GLOBAL_TRANSLATE_BOUND (flip/rotation preserve radius),
        # so a box whose nearest corner radius exceeds
        # (rmax + bound)/scale_min can never re-enter — exact by construction
        # (augment.sample_global_augment_params clips the translate draw).
        if self.augment and self.device_global_augment:
            dr = np.asarray(self.cfg.detection_range)
            rmax = float(np.hypot(np.abs(dr[[0, 3]]).max(), np.abs(dr[[1, 4]]).max()))
            corners = agm.box2d_corners_np(
                gt_boxes[:, [0, 1, 3, 4, 6]].astype(np.float64)
            )
            rmin = np.hypot(corners[..., 0], corners[..., 1]).min(axis=1)
            keep = rmin <= (rmax + agm.GLOBAL_TRANSLATE_BOUND) / agm.GLOBAL_SCALE_MIN
            gt_boxes = gt_boxes[keep]
            gt_classes = gt_classes[keep]
        else:
            dr = np.asarray(self.cfg.detection_range)
            keep = _filter_gt_outside_range_np(gt_boxes, dr[[0, 1, 3, 4]])
            gt_boxes = gt_boxes[keep]
            gt_classes = gt_classes[keep]
            gt_boxes[:, 6] = limit_period_np(gt_boxes[:, 6], 0.5, 2 * np.pi)
        self.rng.shuffle(points)

        sample.update(points=points, gt_boxes=gt_boxes, gt_classes=gt_classes)
        return sample

    def epoch_order(self, shuffle: bool = True) -> np.ndarray:
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        return order

    def iter_points_native(self, order: np.ndarray | None = None, num_threads: int = 4):
        """Yield (info, padded_points, n) with disk IO in native C++ threads
        (runtime/pointcloud_loader.cc) overlapping the consumer's device work.
        Inference-path counterpart of the reference's DataLoader workers;
        training still uses __getitem__ (augmentation needs the gt)."""
        from det3d_tpu.data.native_loader import AsyncPointCloudLoader, available

        idxs = order if order is not None else np.arange(len(self))
        if not available():
            for i in idxs:
                info = self.infos[i]
                pts = self.load_points(info)
                n = min(len(pts), self.cfg.max_points)
                out = np.zeros((self.cfg.max_points, pts.shape[1]), np.float32)
                out[:n] = pts[:n]
                yield info, out, n
            return
        with AsyncPointCloudLoader(
            self.cfg.max_points,
            self.cfg.num_point_features,
            queue_depth=8,
            num_threads=num_threads,
        ) as ld:
            for i in idxs:
                ld.submit(self.resolve_path(self.infos[i]))
            ld.finish()
            for i in idxs:
                pts, n = ld.next()
                yield self.infos[i], pts, n
