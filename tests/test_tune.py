"""Autotuner (det3d_tpu/tune.py): the lever A/B harness must measure, pick,
and write a loadable tuned config. The levers themselves are semantics-
preserving (equality tests live in test_model/test_targets/test_train_overfit);
this validates the SEARCH machinery on the CPU backend with a tiny geometry.
"""

import json

import pytest

from det3d_tpu.config import load_config

TINY = {
    "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
    "center_limit": [-16.0, -16.0, -10.0, 16.0, 16.0, 10.0],
    "voxel_size": [1.0, 1.0, 11.0],
    "max_voxels": 256,
    "max_num_points": 5,
    "max_points": 2048,
    "max_gt_boxes": 8,
    "compute_dtype": "float32",
}


@pytest.fixture(scope="module")
def tuned(tmp_path_factory):
    from det3d_tpu.tune import tune

    tmp = tmp_path_factory.mktemp("tune")
    cfg_path = tmp / "tiny.json"
    cfg_path.write_text(json.dumps(TINY))
    out_path = tmp / "tiny_tuned.json"
    report = tune(
        str(cfg_path),
        out_path=str(out_path),
        mode="both",
        infer_iters=2,
        train_iters=1,
        batch_size=1,
        # pack_w covers both modes and keeps the test at tiny compiles;
        # fuse_in_stats uses identical machinery
        only_levers=("pack_w",),
    )
    return report, out_path


def test_report_covers_both_modes(tuned):
    report, _ = tuned
    assert set(report["modes"]) == {"infer", "train"}
    for name, mode in report["modes"].items():
        assert mode["final_ms"] > 0
        # infer measures the flip; train INHERITS the shared pack_w decision
        # (first-mode-decides) so it records only its baseline trial
        assert len(mode["trials"]) >= (2 if name == "infer" else 1)
        # greedy never adopts a slower flip (a faster-but-within-margin trial
        # may legitimately beat final_ms without being adopted)
        assert mode["final_ms"] <= mode["trials"][0]["ms"]


def test_tuned_config_loads_and_carries_choices(tuned):
    report, out_path = tuned
    cfg = load_config(str(out_path))
    for lever, value in report["chosen"].items():
        assert getattr(cfg, lever) == value
    # untouched keys survive the round-trip
    assert cfg.max_voxels == TINY["max_voxels"]


def test_only_requested_levers_measured(tuned):
    report, _ = tuned
    measured = {k for m in report["modes"].values() for t in m["trials"] for k in t["levers"]}
    assert measured <= {"pack_w"}


def test_every_lever_is_a_config_field():
    """Lever drift guard: each tune lever must be a real Config field (a
    deleted lever must leave LEVERS too — round-3 cleanup invariant)."""
    import dataclasses

    from det3d_tpu.config import Config
    from det3d_tpu.tune import LEVERS

    fields = {f.name for f in dataclasses.fields(Config)}
    for name, candidates, modes, _ in LEVERS:
        assert name in fields, name
        assert getattr(Config, name) in candidates  # default is a candidate
        assert set(modes) <= {"infer", "train"}
