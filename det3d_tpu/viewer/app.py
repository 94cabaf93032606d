"""Scene viewer application: browse info + detection pickles, save frames.

Counterpart of the reference's `PCViewer` (reference: viewer.py:34-695):
loads a data_info pickle and an optional detection-annos pickle, renders any
frame (points + gt + detections with FP/FN coloring + optional
anchors/voxels), and batch-exports frames — the headless equivalent of the
reference's screenshot/video capture (viewer.py:86-104). Driven from the CLI:

    python -m det3d_tpu.cli view --config ... --info data_info.pkl \
        --dt dt.pkl --frames 0:10 --out shots/
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from det3d_tpu.config import Config
from det3d_tpu.viewer.render import BEVRenderer


def _annos_to_boxes(annos: dict) -> tuple[np.ndarray, np.ndarray]:
    if len(annos.get("name", ())) == 0:
        return np.zeros((0, 7), np.float32), np.zeros((0,), np.float32)
    boxes = np.concatenate(
        [annos["location"], annos["dimensions"], annos["rotation_y"][..., None]],
        axis=1,
    ).astype(np.float32)
    scores = np.asarray(annos.get("score", np.zeros(len(boxes))), np.float32)
    return boxes, scores


class SceneViewer:
    def __init__(
        self,
        cfg: Config,
        info_path: str | Path | None = None,
        dt_path: str | Path | None = None,
    ):
        self.cfg = cfg
        self.infos: list[dict] = []
        self.dt_annos: list[dict] | None = None
        if info_path:
            root = Path(cfg.data_root)
            with open(root / info_path if not Path(info_path).is_absolute() else info_path, "rb") as f:
                self.infos = pickle.load(f)
        if dt_path:
            with open(dt_path, "rb") as f:
                self.dt_annos = pickle.load(f)

    def __len__(self) -> int:
        return len(self.infos)

    def load_points(self, info: dict) -> np.ndarray:
        return np.fromfile(
            Path(self.cfg.data_root) / info["velodyne_path"], dtype=np.float32
        ).reshape(-1, self.cfg.num_point_features)

    def render_frame(
        self,
        idx: int,
        out_path: str | Path,
        *,
        show_anchors: bool = False,
        show_voxels: bool = False,
    ) -> Path:
        info = self.infos[idx]
        points = self.load_points(info)
        dr = self.cfg.detection_range
        r = BEVRenderer((dr[0], dr[1], dr[3], dr[4])).points(points)

        gt_boxes = np.zeros((0, 7), np.float32)
        if "annos" in info:
            gt_boxes, _ = _annos_to_boxes(info["annos"])
        if self.dt_annos is not None:
            dt_boxes, scores = _annos_to_boxes(self.dt_annos[idx])
            r.detections_vs_gt(gt_boxes, dt_boxes, scores)
        elif len(gt_boxes):
            r.boxes(gt_boxes, "#00d000")

        if show_anchors:
            from det3d_tpu.anchors import build_anchors

            r.anchors(build_anchors(self.cfg).anchors)
        if show_voxels:
            import jax

            from det3d_tpu.ops.voxelize import VoxelizerSpec, voxelize

            spec = VoxelizerSpec.from_config(self.cfg)
            pts = np.zeros((self.cfg.max_points, points.shape[1]), np.float32)
            n = min(len(points), self.cfg.max_points)
            pts[:n] = points[:n]
            frame = jax.device_get(voxelize(pts, np.int32(n), spec))
            r.voxel_grid(frame.coors, self.cfg.voxel_size, self.cfg.detection_offset)

        r.title(f"frame {info.get('image_idx', idx)}")
        return r.save(out_path)

    def render_image_frame(self, idx: int, out_path: str | Path) -> Path:
        """Camera panel: the frame's image with projected 3D gt/detection
        wireframes (the reference viewer shows this panel by default,
        reference viewer.py:230-235). Requires img_path + calib in the info;
        gt annos are already lidar-frame (create_info converts at index
        time), which is what the projection expects."""
        import matplotlib.image as mpimg

        from det3d_tpu.viewer.render import render_image_overlay

        info = self.infos[idx]
        if "img_path" not in info:
            raise ValueError(f"frame {idx}: info has no img_path (lidar-only dataset?)")
        missing = [
            k for k in ("calib/P2", "calib/R0_rect", "calib/Tr_velo_to_cam")
            if k not in info
        ]
        if missing:
            raise ValueError(
                f"frame {idx}: info lacks {missing} — cannot project boxes"
            )
        image = mpimg.imread(str(Path(self.cfg.data_root) / info["img_path"]))

        gt_boxes = None
        if "annos" in info:
            gt_boxes, _ = _annos_to_boxes(info["annos"])
        dt_boxes = None
        if self.dt_annos is not None:
            dt_boxes, _ = _annos_to_boxes(self.dt_annos[idx])
        return render_image_overlay(
            image, info, gt_boxes=gt_boxes, dt_boxes=dt_boxes, out_path=out_path
        )

    def export_frames(
        self, indices, out_dir: str | Path, *, image: bool = False, **kw
    ) -> list[Path]:
        out_dir = Path(out_dir)
        paths = []
        for i in indices:
            stem = f"{self.infos[i].get('image_idx', i):06d}"
            paths.append(self.render_frame(i, out_dir / f"{stem}.png", **kw))
            if image:
                paths.append(self.render_image_frame(i, out_dir / f"{stem}_cam.png"))
        return paths
