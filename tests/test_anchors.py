"""Golden tests for build_anchors at the production ntusl_20cm geometry.

Values are computed independently in-test from the reference's generation
formula (reference: framework/anchor_assigner.py:300-320 — grid centers at
`idx*stride + offset + stride/2`, z-offset overridden to half the anchor
height) and the hard-coded class specs (:224-245). The flat layout is the
reference's own anchor-major ordering (channel·fx·fy + x·fy + y), so the
flat table is element-for-element the reference's concatenation.
"""

import os

import numpy as np
import pytest

from det3d_tpu.anchors import build_anchors
from det3d_tpu.config import load_config

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "ntusl_20cm.json")

# (class, (l, w, h), rotation, matched, unmatched) in channel order —
# independently restated from reference framework/anchor_assigner.py:224-245
CHANNELS = [
    ("vehicle", (4.6, 2.10, 1.8), 0.0, 0.6, 0.45),
    ("vehicle", (4.6, 2.10, 1.8), np.pi / 2, 0.6, 0.45),
    ("vehicle", (7.5, 2.6, 2.9), 0.0, 0.6, 0.45),
    ("vehicle", (7.5, 2.6, 2.9), np.pi / 2, 0.6, 0.45),
    ("vehicle", (12.6, 2.9, 3.8), 0.0, 0.6, 0.45),
    ("vehicle", (12.6, 2.9, 3.8), np.pi / 2, 0.6, 0.45),
    ("pedestrian", (0.96874749, 0.9645992, 1.81212425), 0.0, 0.45, 0.25),
    ("cyclist", (2.02032733, 0.98075615, 1.72027404), 0.0, 0.5, 0.25),
    ("cyclist", (2.02032733, 0.98075615, 1.72027404), np.pi / 2, 0.5, 0.25),
]


@pytest.fixture(scope="module")
def production():
    cfg = load_config(CFG_PATH)
    return cfg, build_anchors(cfg)


class TestProductionAnchors:
    def test_geometry_constants(self, production):
        cfg, aset = production
        assert cfg.grid_size[:2] == (800, 800)
        assert aset.grid_hw == (400, 400)
        assert aset.num_channels == 9
        assert aset.num_anchors == 400 * 400 * 9 == 1_440_000
        assert aset.class_channels == {
            "vehicle": (0, 6), "pedestrian": (6, 7), "cyclist": (7, 9)
        }

    def test_sampled_anchor_values(self, production):
        """Anchor rows equal the reference formula at sampled (x, y, ch)."""
        cfg, aset = production
        fx, fy = aset.grid_hw
        # production strides/offsets: 160 m over 400 cells → 0.4 m,
        # offset −80 (snapped range) + stride/2
        stride = cfg.detection_range_diff[0] / fx
        assert stride == pytest.approx(0.4)
        off_x = cfg.detection_offset[0] + stride / 2
        off_y = cfg.detection_offset[1] + stride / 2
        assert off_x == pytest.approx(-80.0 + 0.2)

        a = aset.num_channels
        rng = np.random.RandomState(0)
        for _ in range(50):
            x, y, ch = rng.randint(fx), rng.randint(fy), rng.randint(a)
            _, (l, w, h), rot, _, _ = CHANNELS[ch]
            got = aset.anchors[ch * fx * fy + x * fy + y]
            np.testing.assert_allclose(
                got,
                [x * stride + off_x, y * stride + off_y, h / 2, l, w, h, rot],
                rtol=1e-6, atol=1e-6,
            )

    def test_thresholds_per_channel(self, production):
        _, aset = production
        a = aset.num_channels
        m = aset.matched_threshold.reshape(a, -1).T
        u = aset.unmatched_threshold.reshape(a, -1).T
        for ch, (_, _, _, matched, unmatched) in enumerate(CHANNELS):
            assert (m[:, ch] == np.float32(matched)).all()
            assert (u[:, ch] == np.float32(unmatched)).all()

    def test_bev_boxes_swap_dims_at_quarter_turn(self, production):
        """rbbox2d_to_near_bbox: rot=π/2 channels swap l/w in the standup box
        (reference: framework/box_np_ops.py:308-320)."""
        _, aset = production
        fx, fy = aset.grid_hw
        a = aset.num_channels
        loc = 123 * fy + 45
        for ch, (_, (l, w, _), rot, _, _) in enumerate(CHANNELS):
            idx = ch * fx * fy + loc
            bv = aset.anchors_bv[idx]
            cx, cy = aset.anchors[idx, :2]
            dims_x = bv[2] - bv[0]
            dims_y = bv[3] - bv[1]
            expect = (w, l) if abs(rot) > np.pi / 4 else (l, w)
            assert dims_x == pytest.approx(expect[0], rel=1e-5)
            assert dims_y == pytest.approx(expect[1], rel=1e-5)
            assert (bv[0] + bv[2]) / 2 == pytest.approx(cx, abs=1e-4)
            assert (bv[1] + bv[3]) / 2 == pytest.approx(cy, abs=1e-4)

    def test_per_class_tables_are_row_range_views(self, production):
        """Per-class tables are the contiguous [c0·HW, c1·HW) row ranges of
        the global anchor-major table (reference class_masks semantics,
        anchor_assigner.py:284-285)."""
        _, aset = production
        fx, fy = aset.grid_hw
        rng = np.random.RandomState(1)
        for _ in range(20):
            ch = rng.randint(aset.num_channels)
            x, y = rng.randint(fx), rng.randint(fy)
            mine = aset.anchors[ch * fx * fy + x * fy + y]
            name = CHANNELS[ch][0]
            c0, c1 = aset.class_channels[name]
            per_cls = aset.anchors_by_class[name]
            np.testing.assert_array_equal(
                per_cls[(ch - c0) * fx * fy + x * fy + y], mine
            )

    def test_z_offset_is_half_height_not_range_z(self, production):
        """The reference overrides z_offset to size[2]/2 (ground-plane
        anchors), ignoring the z detection offset — pin that quirk."""
        _, aset = production
        a = aset.num_channels
        z = aset.anchors[:, 2].reshape(a, -1)
        for ch, (_, (_, _, h), _, _, _) in enumerate(CHANNELS):
            assert (z[ch] == np.float32(h / 2)).all()
