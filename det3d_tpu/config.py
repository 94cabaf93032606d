"""Experiment configuration.

Preserves the reference's flat-JSON config schema (reference:
configs/ntusl_20cm.json) but — unlike the reference, which mutates the config
dict in place to pass derived values between components (reference:
framework/voxel_generator.py:23-26, framework/anchor_assigner.py:222-245) —
derived quantities here are computed once into an immutable `Config` object.

Derived values reproduced exactly:
  * the voxel-grid snap of the detection range (grid_size, detection_offset,
    detection_range_diff) — reference framework/voxel_generator.py:7-15;
  * the hard-coded per-class anchor specifications — reference
    framework/anchor_assigner.py:222-245.
"""

from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path
from typing import Any

import numpy as np


@dataclasses.dataclass(frozen=True)
class ClassSpec:
    """Anchor specification for one detection class.

    Mirrors the per-class dicts the reference writes into its config
    (reference: framework/anchor_assigner.py:224-245).
    """

    name: str
    sizes: tuple[tuple[float, float, float], ...]   # (l, w, h) per size
    rotations: tuple[float, ...]
    feature_map_size: tuple[int, int, int]          # per size; all equal here
    matched_threshold: float
    unmatched_threshold: float

    @property
    def num_anchors_per_loc(self) -> int:
        return len(self.sizes) * len(self.rotations)


# The reference hard-codes these three classes regardless of the JSON's
# detect_class entry (reference: framework/anchor_assigner.py:222).
DEFAULT_CLASS_SPECS: tuple[ClassSpec, ...] = (
    ClassSpec(
        name="vehicle",
        sizes=((4.6, 2.10, 1.8), (7.5, 2.6, 2.9), (12.6, 2.9, 3.8)),
        rotations=(0.0, 1.5707963267948966),
        feature_map_size=(400, 400, 1),
        matched_threshold=0.6,
        unmatched_threshold=0.45,
    ),
    ClassSpec(
        name="pedestrian",
        sizes=((0.96874749, 0.9645992, 1.81212425),),
        rotations=(0.0,),
        feature_map_size=(400, 400, 1),
        matched_threshold=0.45,
        unmatched_threshold=0.25,
    ),
    ClassSpec(
        name="cyclist",
        sizes=((2.02032733, 0.98075615, 1.72027404),),
        rotations=(0.0, 1.5707963267948966),
        feature_map_size=(400, 400, 1),
        matched_threshold=0.5,
        unmatched_threshold=0.25,
    ),
)


@dataclasses.dataclass(frozen=True)
class Config:
    """Immutable experiment configuration with all derived geometry."""

    # ---- raw schema fields (reference: configs/ntusl_20cm.json) ----
    data_root: str = ""
    model_path: str = ""
    train_info: tuple[str, ...] = ()
    eval_info: tuple[str, ...] = ()
    dt_info: str = "dt_info.pkl"
    experiment: str = "default"
    result_path: str = "results/"
    batch_size: int = 1
    num_workers: int = 0
    learning_rate: float = 5e-4
    create_mask_gpu: int = 1
    feature_map_size: tuple[int, int, int] = (400, 400, 1)
    detection_range_raw: tuple[float, ...] = (-80.0, -80.0, -2.5, 80.0, 80.0, 8.5)
    center_limit: tuple[float, ...] = (-80.0, -80.0, -10.0, 80.0, 80.0, 10.0)
    voxel_size: tuple[float, float, float] = (0.2, 0.2, 11.0)
    max_voxels: int = 16000
    max_num_points: int = 15
    num_point_features: int = 4
    detect_class: tuple[str, ...] = ("vehicle", "pedestrian", "cyclist")
    box_code_size: int = 7

    # ---- framework-level knobs (new; no reference counterpart) ----
    max_points: int = 200_000        # static per-frame point budget (pad-to-max)
    head: str = "shared"             # detection head: "shared" | "multi"
    pack_w: bool = True              # w-parity packed block0 (column parity folded
    #                                  into channels so the 64-ch block runs on full
    #                                  MXU lanes; weight-side only — checkpoints and
    #                                  the torch transplant are unaffected)
    max_gt_boxes: int = 64           # static per-class gt budget for on-device targets
    compute_dtype: str = "bfloat16"  # conv/matmul compute dtype ("float32" for parity runs)
    fuse_in_stats: bool = True       # inference: upsample-branch IN stats from input
    #                                  Gram matrices so normalize+relu fuses into the
    #                                  deconv epilogue (packed path only; train and
    #                                  parity runs can disable for exact round-2 math)
    block0_blocked: bool = False     # inference: emit the s2d canvas as
    #                                  halo'd H-blocks and run ALL of block0
    #                                  batch-over-blocks (VALID-row convs) —
    #                                  removes XLA's space-to-batch pad +
    #                                  full-canvas blocking copy (round-4
    #                                  lever; see models/pointpillars
    #                                  RPN._blocked_block0)
    block0_blocked_train: bool = False  # training: same blocked-halo block0
    #                                  under the train step. At batch ≥ 2
    #                                  space-to-batch never fires, so dense
    #                                  block0 convs run the slow batch-2
    #                                  emitters (~60 TF/s, tools/train_mfu);
    #                                  blocked runs them batch-(B·nblk).
    #                                  Engages only at per-device batch ≤ 2
    #                                  (the measured win region; b=4/b=8
    #                                  regress — BASELINE round-5 table).
    #                                  Separate lever from block0_blocked:
    #                                  the inference decision (s2b-copy
    #                                  removal) and the training one (conv
    #                                  emitter rate) have different physics.
    late_blocked_train: bool = False  # training: blocks 1-2 batch-over-
    #                                  blocks under the train step. The same
    #                                  physics as block0_blocked_train one
    #                                  level down: at per-device batch 2 the
    #                                  dense block1/2 conv emitters run at
    #                                  ~60-70 TF/s (tools/train_mfu.py round-5
    #                                  table) while identical shapes batched
    #                                  over row-blocks reach 150+. Each block
    #                                  re-blocks its input with fresh 5-row
    #                                  halos (static slice+pad+stack; the
    #                                  autodiff transpose sums halo-duplicate
    #                                  cotangents) and runs VALID-row convs at
    #                                  batch B*nblk. Engages only at
    #                                  per-device batch <= 2, like the block0
    #                                  lever.
    split_head: bool = True          # inference, packed shared-head only:
    #                                  per-column-parity neck emission + two
    #                                  half-width head dots (RPN.split_out) —
    #                                  the (B,H,W/2,640)→(B,H,W,320) unpack
    #                                  relayout never materializes. Measured
    #                                  a win at 20 cm (6.23→5.96 round 3);
    #                                  geometry-dependent, hence a lever.
    # (round-3 levers scatter_subtile / fused_adam / matcher_skip and the
    #  round-4 segmented-PFN lever — both the XLA formulation and the
    #  all-VMEM Pallas kernel — were measured on-chip as regressions or
    #  no-wins (BASELINE.md "Round-3 final lever A/Bs" / "segmented PFN")
    #  and their surfaces deleted)

    # ---- derived (reference: framework/voxel_generator.py:7-15) ----
    detection_range: tuple[float, ...] = ()
    detection_offset: tuple[float, float, float] = ()
    detection_range_diff: tuple[float, float, float] = ()
    grid_size: tuple[int, int, int] = ()

    class_specs: tuple[ClassSpec, ...] = DEFAULT_CLASS_SPECS

    # -- convenience views --------------------------------------------------
    @property
    def num_anchors_per_loc(self) -> int:
        return sum(s.num_anchors_per_loc for s in self.class_specs)

    @property
    def num_anchors(self) -> int:
        return sum(
            s.num_anchors_per_loc * int(np.prod(s.feature_map_size))
            for s in self.class_specs
        )

    def class_spec(self, name: str) -> ClassSpec:
        for s in self.class_specs:
            if s.name == name:
                return s
        raise KeyError(name)

    def replace(self, **kw: Any) -> "Config":
        cfg = dataclasses.replace(self, **kw)
        if "voxel_size" in kw or "detection_range_raw" in kw:
            cfg = _with_derived(cfg)
            # keep feature_map_size / per-class feature maps consistent with
            # the new grid (mirrors load_config) unless explicitly overridden
            if "feature_map_size" not in kw:
                fms = (cfg.grid_size[0] // 2, cfg.grid_size[1] // 2, 1)
                specs = kw.get(
                    "class_specs",
                    tuple(
                        dataclasses.replace(s, feature_map_size=fms)
                        for s in cfg.class_specs
                    ),
                )
                cfg = dataclasses.replace(
                    cfg, feature_map_size=fms, class_specs=specs
                )
        return cfg


def _snap_range(detection_range: np.ndarray, voxel_size: np.ndarray):
    """Snap the detection range onto an integer voxel grid.

    Reproduces reference framework/voxel_generator.py:7-15 in float32: the
    range is re-centred so `grid_size * voxel_size` exactly tiles it.
    """
    detection_range = detection_range.astype(np.float32)
    voxel_size = voxel_size.astype(np.float32)
    center = (detection_range[3:] + detection_range[:3]) / 2
    extent = detection_range[3:] - detection_range[:3]
    grid_size = (extent / voxel_size).astype(np.int32)
    range_diff = grid_size.astype(np.float32) * voxel_size
    offset = center - range_diff / 2
    snapped = np.concatenate([offset, offset + range_diff], axis=0)
    return snapped, offset, range_diff, grid_size


def _with_derived(cfg: Config) -> Config:
    snapped, offset, range_diff, grid_size = _snap_range(
        np.array(cfg.detection_range_raw, np.float32),
        np.array(cfg.voxel_size, np.float32),
    )
    return dataclasses.replace(
        cfg,
        detection_range=tuple(float(v) for v in snapped),
        detection_offset=tuple(float(v) for v in offset),
        detection_range_diff=tuple(float(v) for v in range_diff),
        grid_size=tuple(int(v) for v in grid_size),
    )


_TRAILING_COMMA = re.compile(r",\s*([}\]])")


def _loads_tolerant(text: str) -> dict:
    """Parse JSON, tolerating trailing commas (several reference configs —
    e.g. configs/nuscene.json — are invalid strict JSON)."""
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        return json.loads(_TRAILING_COMMA.sub(r"\1", text))


def load_config(path: str | Path | dict, **overrides: Any) -> Config:
    """Load a reference-schema JSON config file into a `Config`.

    Accepts the exact key set of reference configs/*.json; unknown keys are
    ignored (the reference's `anchor_sizes` / `rotations` / threshold keys are
    superseded by the hard-coded class specs, exactly as in the reference where
    AnchorAssigner overwrites them — framework/anchor_assigner.py:222-245).
    """
    if isinstance(path, dict):
        raw = dict(path)
    else:
        raw = _loads_tolerant(Path(path).read_text())
    raw.update(overrides)

    # Levers that existed in earlier rounds and were deleted after losing
    # their on-chip A/Bs (BASELINE.md "Round-3 final lever A/Bs" /
    # "segmented PFN"). A saved tuned config carrying one would otherwise be
    # silently reinterpreted — warn so the behavior change is visible.
    removed = {"scatter_subtile", "matcher_skip", "fused_adam", "pfn_segmented"}
    for key in removed & raw.keys():
        import warnings

        warnings.warn(
            f"config key '{key}' is a removed perf lever (rejected on-chip, "
            "see BASELINE.md); it is ignored and the default path runs",
            stacklevel=2,
        )

    def get(key, default):
        return raw.get(key, default)

    def tup(v):
        return tuple(v) if isinstance(v, (list, tuple)) else v

    cfg = Config(
        data_root=get("data_root", ""),
        model_path=get("model_path", ""),
        train_info=tup(get("train_info", ())),
        # (feature_map_size patched below once grid_size is derived)
        eval_info=tup(get("eval_info", ())),
        dt_info=get("dt_info", "dt_info.pkl"),
        experiment=get("experiment", "default"),
        result_path=get("result_path", "results/"),
        batch_size=int(get("batch_size", 1)),
        num_workers=int(get("num_workers", 0)),
        learning_rate=float(get("learning_rate", 5e-4)),
        create_mask_gpu=int(get("create_mask_gpu", 1)),
        # placeholder — unconditionally replaced with grid//2 below (the
        # JSON field is ignored; see the derivation comment at the end)
        feature_map_size=(400, 400, 1),
        detection_range_raw=tup(get("detection_range", (-80.0, -80.0, -2.5, 80.0, 80.0, 8.5))),
        center_limit=tup(get("center_limit", (-80.0, -80.0, -10.0, 80.0, 80.0, 10.0))),
        voxel_size=tup(get("voxel_size", (0.2, 0.2, 11.0))),
        max_voxels=int(get("max_voxels", 16000)),
        max_num_points=int(get("max_num_points", 15)),
        num_point_features=int(get("num_point_features", 4)),
        detect_class=tup(get("detect_class", ("vehicle", "pedestrian", "cyclist"))),
        box_code_size=int(get("box_code_size", 7)),
        max_points=int(get("max_points", 200_000)),
        max_gt_boxes=int(get("max_gt_boxes", 64)),
        compute_dtype=get("compute_dtype", "bfloat16"),
        head=get("head", "shared"),
        pack_w=bool(get("pack_w", True)),
        fuse_in_stats=bool(get("fuse_in_stats", True)),
        block0_blocked=bool(get("block0_blocked", False)),
        block0_blocked_train=bool(get("block0_blocked_train", False)),
        late_blocked_train=bool(get("late_blocked_train", False)),
        split_head=bool(get("split_head", True)),
    )
    cfg = _with_derived(cfg)
    # The feature map is ALWAYS the voxel grid at half resolution: the shared
    # RPN's overall stride is 2 (entry stride-2 conv; the upsample branches
    # restore every block to that scale — networks/pointpillars8_shared.py:
    # 114-181), so anchors must live on grid//2 or they desync from the head.
    # The JSON field is ignored just as the reference's AnchorAssigner
    # hard-codes per-class 400x400 maps over whatever the config says
    # (anchor_assigner.py:226-243) — correct for the 800-grid 20cm config,
    # stale for the 1600-grid 10cm one, where grid//2 = 800 is the only
    # geometry the live network can produce.
    fms = (cfg.grid_size[0] // 2, cfg.grid_size[1] // 2, 1)
    json_fms = raw.get("feature_map_size")
    if json_fms is not None and tuple(json_fms) != fms:
        import warnings

        warnings.warn(
            f"config feature_map_size {tuple(json_fms)} disagrees with the "
            f"derived grid//2 = {fms}; the JSON field is ignored (the live "
            "network can only produce grid//2 maps)",
            stacklevel=2,
        )
    specs = tuple(
        dataclasses.replace(s, feature_map_size=fms) for s in cfg.class_specs
    )
    return dataclasses.replace(cfg, feature_map_size=fms, class_specs=specs)
