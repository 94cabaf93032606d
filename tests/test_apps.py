"""Application-layer tests: config loading, checkpointing, export roundtrip,
serving queue semantics, viewer rendering, CLI parsing."""

import json

import numpy as np
import pytest

from helpers import small_cfg


class TestConfig:
    def test_reference_config_derivation(self):
        from det3d_tpu.config import load_config

        cfg = load_config("configs/ntusl_20cm.json")
        assert cfg.grid_size == (800, 800, 1)
        assert cfg.feature_map_size == (400, 400, 1)
        assert cfg.num_anchors == 1_440_000
        assert cfg.num_anchors_per_loc == 9
        # snap: range re-centred so grid*voxel tiles it exactly
        np.testing.assert_allclose(
            np.array(cfg.detection_range_diff),
            np.array(cfg.grid_size) * np.array(cfg.voxel_size),
            rtol=1e-6,
        )

    def test_all_reference_configs_load(self):
        from pathlib import Path

        from det3d_tpu.config import load_config

        for p in Path("configs").glob("*.json"):
            cfg = load_config(p)
            assert cfg.grid_size[0] > 0, p

    def test_feature_map_derived_for_custom_grid(self, tmp_path):
        from det3d_tpu.config import load_config

        p = tmp_path / "c.json"
        p.write_text(json.dumps({
            "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
            "voxel_size": [1.0, 1.0, 11.0],
        }))
        cfg = load_config(p)
        assert cfg.grid_size == (32, 32, 1)
        assert cfg.feature_map_size == (16, 16, 1)
        assert all(s.feature_map_size == (16, 16, 1) for s in cfg.class_specs)

    def test_trailing_comma_tolerated(self, tmp_path):
        from det3d_tpu.config import load_config

        p = tmp_path / "c.json"
        p.write_text('{"batch_size": 3,}')
        assert load_config(p).batch_size == 3


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        import jax

        from det3d_tpu.train.checkpoint import CheckpointManager
        from det3d_tpu.train.trainer import Trainer

        cfg = small_cfg()
        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state = state._replace(step=state.step + 7)

        mgr = CheckpointManager(tmp_path)
        assert not mgr.has_latest()
        mgr.save(jax.device_get(state))
        assert mgr.has_latest()
        assert (tmp_path / "7").exists()

        template = trainer.init_state(jax.random.PRNGKey(1))
        restored = mgr.restore_latest(template)
        assert int(restored.step) == 7
        orig = jax.tree.leaves(state.params)
        back = jax.tree.leaves(restored.params)
        for a, b in zip(orig, back):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_readonly_open_has_no_side_effects(self, tmp_path):
        """Readers (infer/serve/export/interop) must not mkdir a typo'd path
        or sweep another process's in-flight .tmp.* save dirs."""
        import pytest as _pytest

        from det3d_tpu.train.checkpoint import CheckpointManager, load_latest_state

        missing = tmp_path / "typo_dir"
        mgr = CheckpointManager(missing, readonly=True)
        assert not missing.exists()  # no mkdir side effect
        with _pytest.raises(RuntimeError, match="readonly"):
            mgr.save(None)

        live = tmp_path / "live"
        live.mkdir()
        inflight = live / ".tmp.latest.deadbeef"
        inflight.mkdir()
        CheckpointManager(live, readonly=True)
        assert inflight.exists()  # reader must not sweep a writer's temp
        CheckpointManager(live)  # writer DOES sweep stale temps
        assert not inflight.exists()

        with _pytest.raises(FileNotFoundError):
            load_latest_state(small_cfg(), missing)

    def test_crash_during_save_preserves_previous_latest(self, tmp_path, monkeypatch):
        """A failure mid-save must never destroy the existing `latest`
        resume point (the old rmtree-then-save sequence did)."""
        import jax

        from det3d_tpu.train import checkpoint as ckpt_mod
        from det3d_tpu.train.checkpoint import CheckpointManager
        from det3d_tpu.train.trainer import Trainer

        cfg = small_cfg()
        trainer = Trainer(cfg)
        state = jax.device_get(trainer.init_state(jax.random.PRNGKey(0)))

        mgr = CheckpointManager(tmp_path)
        mgr.save(state._replace(step=state.step + 5))
        assert mgr.has_latest()

        # simulate a crash inside the checkpoint write of the next save
        orig_save = ckpt_mod.ocp.StandardCheckpointer.save

        def boom(self, path, *a, **k):
            if ".tmp." in str(path):
                raise RuntimeError("simulated crash mid-save")
            return orig_save(self, path, *a, **k)

        monkeypatch.setattr(ckpt_mod.ocp.StandardCheckpointer, "save", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            mgr.save(state._replace(step=state.step + 10))
        monkeypatch.undo()

        restored = mgr.restore_latest(trainer.init_state(jax.random.PRNGKey(1)))
        assert int(restored.step) == 5  # previous latest survived
        # a fresh manager sweeps any leftover temp dirs
        CheckpointManager(tmp_path)
        assert not list(tmp_path.glob(".tmp.*"))

    def test_lr_override(self):
        import jax

        from det3d_tpu.train.trainer import Trainer

        cfg = small_cfg()
        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state2 = Trainer.override_lr(state, 1e-5)
        assert float(state2.opt_state[1].hyperparams["learning_rate"]) == pytest.approx(1e-5)


class TestExportRoundtrip:
    def test_export_and_run(self, tmp_path):
        import jax

        from det3d_tpu.deploy.export import export_detector
        from det3d_tpu.deploy.runtime import ExportedDetector
        from det3d_tpu.pipeline import Detector

        cfg = small_cfg()
        out = export_detector(cfg, out_dir=tmp_path / "artifact")
        runner = ExportedDetector(out)

        rng = np.random.RandomState(0)
        pts = np.concatenate(
            [rng.uniform(-7, 7, (800, 2)), rng.uniform(-2, 6, (800, 1)),
             rng.uniform(0, 1, (800, 1))], 1
        ).astype(np.float32)

        annos = runner.detect(pts)
        # must agree with the live detector under identical weights
        det = Detector(cfg)
        live = det.detect(runner.variables, pts)
        np.testing.assert_array_equal(annos["name"], live["name"])
        np.testing.assert_allclose(annos["location"], live["location"], atol=1e-5)


class TestServer:
    def test_queue_drops_stale_frames(self):
        import jax

        from det3d_tpu.apps.serve_app import PointCloudServer
        from det3d_tpu.pipeline import Detector

        cfg = small_cfg()
        det = Detector(cfg)
        v = det.init_variables(jax.random.PRNGKey(0))
        server = PointCloudServer(cfg, v, queue_size=2)
        server.detector = det
        p = np.zeros((10, 4), np.float32)
        assert server.submit(p, stamp=1.0)
        assert server.submit(p, stamp=2.0)
        assert server.submit(p, stamp=3.0)  # drops stamp=1.0
        stamps = []
        while not server.queue.empty():
            stamps.append(server.queue.get_nowait()[1])
        assert stamps == [2.0, 3.0]

    def test_spin_serves_frames(self):
        import jax

        from det3d_tpu.apps.serve_app import PointCloudServer
        from det3d_tpu.pipeline import Detector

        cfg = small_cfg()
        det = Detector(cfg)
        v = det.init_variables(jax.random.PRNGKey(0))
        server = PointCloudServer(cfg, v, queue_size=4)
        server.detector = det
        rng = np.random.RandomState(0)
        for _ in range(3):
            pts = np.concatenate(
                [rng.uniform(-7, 7, (500, 2)), rng.uniform(-2, 6, (500, 1)),
                 rng.uniform(0, 1, (500, 1))], 1).astype(np.float32)
            server.submit(pts)
        results = []
        server.spin(max_frames=3, on_result=lambda a, l: results.append(a))
        assert len(results) == 3
        assert len(server.latencies) == 3

    def test_replay_serves_bin_directory(self, tmp_path, capsys):
        """serve --replay: raw .bin frames stream from disk through the
        async loader (numpy fallback if the C++ build is unavailable) into
        the same bounded-queue server; `loop` cycles the directory. The
        real-IO counterpart of the reference's ROS feed (ros_node.py:61-83)."""
        from det3d_tpu.apps.serve_app import serve_replay

        cfg = small_cfg()
        rng = np.random.RandomState(0)
        for i in range(3):
            pts = np.concatenate(
                [rng.uniform(-7, 7, (400, 2)), rng.uniform(-2, 6, (400, 1)),
                 rng.uniform(0, 1, (400, 1))], 1).astype(np.float32)
            pts.tofile(tmp_path / f"{i:06d}.bin")

        # pace slower than the consumer so the bounded queue (which DROPS
        # stale frames by design) never overflows and every frame serves
        lat = serve_replay(cfg, str(tmp_path), hz=10.0)
        assert len(lat) == 3
        assert all(l > 0 for l in lat)

        # loop mode: 3 files serve 5 frames
        lat = serve_replay(cfg, str(tmp_path), hz=10.0, frames=5, loop=True)
        assert len(lat) == 5

    def test_replay_missing_dir_raises(self, tmp_path):
        from det3d_tpu.apps.serve_app import serve_replay

        with pytest.raises(FileNotFoundError):
            serve_replay(small_cfg(), str(tmp_path / "nope"), hz=100.0)

    def test_replay_malformed_bin_raises_not_hangs(self, tmp_path, monkeypatch):
        """A producer-thread failure (e.g. a .bin whose byte count is not a
        multiple of the point stride) must surface as an exception in the
        caller, not a silent thread death that leaves spin() waiting."""
        from det3d_tpu.apps.serve_app import serve_replay
        from det3d_tpu.data import native_loader

        # force the numpy fallback path, whose reshape is the failure site
        monkeypatch.setattr(native_loader, "available", lambda: False)
        (tmp_path / "000000.bin").write_bytes(b"\x00" * 13)  # not /16
        with pytest.raises(ValueError):
            serve_replay(small_cfg(), str(tmp_path), hz=100.0)


class TestViewer:
    def test_render_scene_writes_png(self, tmp_path):
        from det3d_tpu.viewer.render import render_scene

        rng = np.random.RandomState(0)
        pts = rng.uniform(-10, 10, (1000, 4)).astype(np.float32)
        gt = np.array([[0, 0, -1.5, 4, 2, 1.6, 0.3]], np.float32)
        dt = np.array([[0.2, 0, -1.5, 4, 2, 1.6, 0.35],
                       [8, 8, -1.5, 4, 2, 1.6, 0.0]], np.float32)
        p = render_scene(pts, gt, dt, np.array([0.9, 0.7]),
                         tmp_path / "s.png", (-12, -12, 12, 12))
        assert p.exists() and p.stat().st_size > 10_000

    def test_match_fp_fn(self):
        from det3d_tpu.viewer.render import match_fp_fn

        gt = np.array([[0, 0, -1.5, 4, 2, 1.6, 0.0]], np.float32)
        dt = np.array([[0.1, 0, -1.5, 4, 2, 1.6, 0.0],
                       [9, 9, -1.5, 4, 2, 1.6, 0.0]], np.float32)
        fp, fn = match_fp_fn(gt, dt)
        np.testing.assert_array_equal(fp, [False, True])
        np.testing.assert_array_equal(fn, [False])


class TestViewer3D:
    def test_box_corners_match_geometry_library(self):
        """The pure-numpy corner generator must agree with the jnp library
        twin (z-bottom origin, yaw about +z) on random boxes."""
        import jax.numpy as jnp

        from det3d_tpu.ops.geometry import center_to_corner_box3d
        from det3d_tpu.viewer.render3d import box_corners_3d

        r = np.random.RandomState(3)
        boxes = np.concatenate(
            [r.uniform(-40, 40, (16, 2)), r.uniform(-2, 1, (16, 1)),
             r.uniform(0.5, 6, (16, 3)), r.uniform(-np.pi, np.pi, (16, 1))],
            axis=1,
        ).astype(np.float64)
        ref = np.asarray(
            center_to_corner_box3d(
                jnp.asarray(boxes[:, :3]), jnp.asarray(boxes[:, 3:6]),
                jnp.asarray(boxes[:, 6]),
            )
        )
        got = box_corners_3d(boxes)
        # corner ORDER may differ between the two generators; compare as sets
        # per box via sorted lexicographic rows
        for g, rf in zip(got, ref):
            gs = g[np.lexsort(g.T)]
            rs = rf[np.lexsort(rf.T)]
            np.testing.assert_allclose(gs, rs, atol=1e-5)

    def test_orbit_camera_projection_geometry(self):
        from det3d_tpu.viewer.render3d import OrbitCamera

        cam = OrbitCamera(azimuth=30.0, elevation=40.0, distance=50.0)
        # the look-at center projects to the image origin at depth=distance
        xy, z = cam.project(np.zeros((1, 3)))
        np.testing.assert_allclose(xy, 0.0, atol=1e-12)
        np.testing.assert_allclose(z, 50.0, atol=1e-9)
        # a point behind the camera gets non-positive depth (culled)
        behind = cam.eye + (cam.eye - cam.center)
        _, zb = cam.project(behind[None])
        assert zb[0] < 0
        # top-down view: world x/y offsets land at distinct image positions
        top = OrbitCamera(azimuth=0.0, elevation=89.9, distance=50.0)
        pts = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 0]])
        xy, z = top.project(pts)
        assert np.all(z > 0)
        assert np.linalg.norm(xy[0] - xy[2]) > 0.05
        assert np.linalg.norm(xy[1] - xy[2]) > 0.05

    def test_render_scene_3d_writes_png(self, tmp_path):
        from det3d_tpu.viewer.render3d import render_scene_3d

        rng = np.random.RandomState(0)
        pts = rng.uniform(-10, 10, (2000, 4)).astype(np.float32)
        gt = np.array([[0, 0, -1.5, 4, 2, 1.6, 0.3]], np.float32)
        dt = np.array([[0.2, 0, -1.5, 4, 2, 1.6, 0.35],
                       [8, 8, -1.5, 4, 2, 1.6, 0.0]], np.float32)
        p = render_scene_3d(pts, gt, dt, np.array([0.9, 0.7]),
                            tmp_path / "s3d.png", title="t")
        assert p.exists() and p.stat().st_size > 10_000

    def test_render_orbit_sweeps_azimuths(self, tmp_path):
        from det3d_tpu.viewer.render3d import render_orbit

        rng = np.random.RandomState(1)
        pts = rng.uniform(-10, 10, (500, 4)).astype(np.float32)
        paths = render_orbit(pts, out_dir=tmp_path / "orbit", n_views=4)
        assert len(paths) == 4
        assert all(p.exists() for p in paths)
        assert len({p.name for p in paths}) == 4  # distinct azimuth names


class TestCLI:
    def test_unknown_command_rejected(self, capsys):
        from det3d_tpu import cli

        with pytest.raises(SystemExit):
            cli.main(["frobnicate"])

    def test_eval_requires_dt_gt(self):
        from det3d_tpu import cli

        with pytest.raises(SystemExit):
            cli.main(["eval", "--config", "configs/ntusl_20cm.json"])

    def test_eval_subcommand_runs(self, tmp_path, capsys):
        import pickle

        from det3d_tpu import cli

        anno = {
            "name": np.array(["vehicle"]),
            "location": np.array([[5.0, 0, -1.0]]),
            "dimensions": np.array([[4.5, 2.0, 1.8]]),
            "rotation_y": np.array([0.3]),
            "num_points": np.array([100]),
            "score": np.array([0.9]),
        }
        for name in ("gt", "dt"):
            with open(tmp_path / f"{name}.pkl", "wb") as f:
                pickle.dump([anno], f)
        cli.main([
            "eval", "--config", "configs/ntusl_20cm.json",
            "--dt", str(tmp_path / "dt.pkl"), "--gt", str(tmp_path / "gt.pkl"),
        ])
        out = capsys.readouterr().out
        assert "Metric: bev" in out and "vehicle" in out


class TestBatchedInfer:
    def test_breakdown_runs_on_current_preds_contract(self):
        """--breakdown manually splits pre/net/post: its post stage must
        track the live preds contract (the round-3 split-head per-parity
        tuples broke the old dict-of-arrays walk — caught by a CLI drive,
        not tests; pinned here)."""
        from det3d_tpu.apps.infer_app import infer

        cfg = small_cfg(max_points=2048, max_voxels=256)
        r = infer(cfg, synthetic=True, num_frames=2,
                  range_thresholds=(80.0,), seed=3, breakdown=True)
        assert len(r["dt_annos"]) == 2

    def test_batched_eval_matches_per_frame(self):
        """--batch N eval must produce the same detection sets as per-frame
        (conv batching only reassociates reductions: tiny float drift)."""
        import numpy as np

        from det3d_tpu.apps.infer_app import infer

        cfg = small_cfg(max_points=2048, max_voxels=256)
        r1 = infer(cfg, synthetic=True, num_frames=6, range_thresholds=(80.0,), seed=3)
        r2 = infer(cfg, synthetic=True, num_frames=6, range_thresholds=(80.0,), seed=3, batch=4)
        assert len(r1["dt_annos"]) == len(r2["dt_annos"]) == 6
        for a, b in zip(r1["dt_annos"], r2["dt_annos"]):
            np.testing.assert_array_equal(np.sort(a["name"]), np.sort(b["name"]))
            if len(a["name"]):
                # near-tie scores can reorder same-class rows between the
                # batched and single paths — compare as sorted sets
                ka = np.lexsort(a["location"].T.round(3))
                kb = np.lexsort(b["location"].T.round(3))
                np.testing.assert_allclose(
                    a["location"][ka], b["location"][kb], atol=1e-3
                )
                np.testing.assert_allclose(
                    np.sort(a["score"]), np.sort(b["score"]), atol=1e-4
                )


class TestShardedBatchInfer:
    def test_device_sharded_batch_matches_plain(self):
        """--batch 8 on the 8-device mesh auto-shards frames across devices
        (make_sharded_infer); detections must match the plain vmapped path
        (the app-level wiring; numerics pinned in tests/test_parallel.py)."""
        import numpy as np

        from det3d_tpu.apps.infer_app import infer

        cfg = small_cfg(max_points=2048, max_voxels=256)
        r1 = infer(cfg, synthetic=True, num_frames=8, range_thresholds=(80.0,), seed=3, batch=4)
        r2 = infer(cfg, synthetic=True, num_frames=8, range_thresholds=(80.0,), seed=3, batch=8)
        assert len(r1["dt_annos"]) == len(r2["dt_annos"]) == 8
        for a, b in zip(r1["dt_annos"], r2["dt_annos"]):
            np.testing.assert_array_equal(np.sort(a["name"]), np.sort(b["name"]))
            if len(a["name"]):
                np.testing.assert_allclose(
                    np.sort(a["score"]), np.sort(b["score"]), atol=1e-4
                )


class TestSpatialInfer:
    def test_spatial_eval_matches_per_frame(self):
        """--spatial eval (frame conv stack GSPMD-partitioned over the
        8-device CPU mesh) must produce the same detections as the plain
        single-device path (the app-level wiring of make_spatial_infer;
        numerics are pinned by tests/test_parallel.py)."""
        import numpy as np

        from det3d_tpu.apps.infer_app import infer

        cfg = small_cfg(max_points=2048, max_voxels=256)
        r1 = infer(cfg, synthetic=True, num_frames=3, range_thresholds=(80.0,), seed=3)
        r2 = infer(
            cfg, synthetic=True, num_frames=3, range_thresholds=(80.0,), seed=3,
            spatial=True,
        )
        assert r2["avg_ms"] > 0
        assert len(r1["dt_annos"]) == len(r2["dt_annos"]) == 3
        # with RANDOM weights a couple of near-score-gate candidates can flip
        # under the sharded IN-stat reduction reordering (exact numerics are
        # pinned in tests/test_parallel.py); here assert the WIRING: detection
        # sets substantially identical frame by frame
        for a, b in zip(r1["dt_annos"], r2["dt_annos"]):
            na, nb = len(a["name"]), len(b["name"])
            assert abs(na - nb) <= max(3, int(0.05 * max(na, nb))), (na, nb)
            if na and nb:
                d = np.linalg.norm(
                    a["location"][:, None, :2] - b["location"][None, :, :2], axis=-1
                )
                matched = (d.min(axis=1) < 0.25).mean()
                assert matched > 0.9, matched

    def test_spatial_rejects_batch(self):
        import pytest

        from det3d_tpu.apps.infer_app import infer

        with pytest.raises(ValueError):
            infer(small_cfg(), synthetic=True, num_frames=2, batch=4, spatial=True)


class TestSpatialServe:
    def test_spatial_serving_loop(self):
        """serve_synthetic(spatial=True) streams frames through the
        spatially-partitioned path on the 8-device CPU mesh."""
        from det3d_tpu.apps.serve_app import serve_synthetic

        cfg = small_cfg(max_points=2048, max_voxels=256)
        lat = serve_synthetic(cfg, frames=3, hz=5.0, spatial=True)
        # the bounded queue may drop frames when the producer outpaces the
        # (slow, CPU-mesh) consumer — the drop policy is itself by-design
        assert 1 <= len(lat) <= 3
        assert all(l > 0 for l in lat)


class TestViewerImageOverlay:
    def _calib(self):
        # simple pinhole: camera at lidar origin looking +x (lidar) = +z (cam)
        velo2cam = np.array(
            [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float64
        )
        rect = np.eye(4)
        p2 = np.array(
            [[500, 0, 320, 0], [0, 500, 240, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            np.float64,
        )
        return {"calib/R0_rect": rect, "calib/Tr_velo_to_cam": velo2cam, "calib/P2": p2}

    def test_projection_front_box_lands_in_image(self):
        from det3d_tpu.viewer.render import project_boxes_to_image

        c = self._calib()
        boxes = np.array([[10.0, 0.0, -1.0, 4.0, 2.0, 1.6, 0.3]])
        pts = project_boxes_to_image(
            boxes, c["calib/R0_rect"], c["calib/Tr_velo_to_cam"], c["calib/P2"],
            image_shape=(480, 640),
        )
        assert pts.shape == (1, 8, 2)
        # box straight ahead → corners near the principal point (320, 240)
        assert 100 < pts[..., 0].mean() < 540
        assert 80 < pts[..., 1].mean() < 400

    def test_behind_camera_box_culled(self):
        from det3d_tpu.viewer.render import project_boxes_to_image

        c = self._calib()
        boxes = np.array([[-10.0, 0.0, -1.0, 4.0, 2.0, 1.6, 0.0]])
        pts = project_boxes_to_image(
            boxes, c["calib/R0_rect"], c["calib/Tr_velo_to_cam"], c["calib/P2"]
        )
        assert pts.shape == (0, 8, 2)

    def test_render_overlay_and_sequence(self, tmp_path):
        from det3d_tpu.viewer.render import render_image_overlay, render_sequence

        c = self._calib()
        img = np.zeros((480, 640, 3), np.uint8)
        out = render_image_overlay(
            img, c, gt_boxes=np.array([[10.0, 0, -1, 4, 2, 1.6, 0.0]]),
            dt_boxes=np.array([[12.0, 1, -1, 4, 2, 1.6, 0.2]]),
            out_path=tmp_path / "ov.png",
        )
        assert out.exists() and out.stat().st_size > 0

        frames = [
            {"points": np.random.rand(100, 4) * 20 - 10,
             "gt_boxes": np.array([[1.0, 2, 0, 4, 2, 1.6, 0.1]])}
            for _ in range(3)
        ]
        paths = render_sequence(frames, tmp_path / "seq", detection_range=(-20, -20, 20, 20))
        assert len(paths) == 3 and all(p.exists() for p in paths)

    def test_cli_view_image_renders_bev_and_camera_panels(self, tmp_path):
        """`cli view --image` writes a BEV png AND a camera-overlay png per
        frame (the reference viewer's default image panel, viewer.py:230-235)."""
        import pickle

        import matplotlib.image as mpimg

        from det3d_tpu import cli

        root = tmp_path / "data"
        (root / "velodyne").mkdir(parents=True)
        pts = np.random.RandomState(0).rand(500, 4).astype(np.float32) * 20 - 10
        pts.tofile(root / "velodyne" / "000000.bin")
        (root / "image_2").mkdir()
        mpimg.imsave(root / "image_2" / "000000.png", np.zeros((480, 640, 3), np.uint8))

        info = {
            "image_idx": 0,
            "velodyne_path": "velodyne/000000.bin",
            "img_path": "image_2/000000.png",
            "img_shape": (480, 640),
            "annos": {
                "name": np.array(["vehicle"]),
                "location": np.array([[10.0, 0.0, -1.0]]),
                "dimensions": np.array([[4.0, 2.0, 1.6]]),
                "rotation_y": np.array([0.3]),
                "score": np.zeros(1),
            },
            **self._calib(),
        }
        with open(root / "data_info.pkl", "wb") as f:
            pickle.dump([info], f)

        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(
            '{"data_root": "%s", "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],'
            ' "voxel_size": [1.0, 1.0, 11.0], "max_voxels": 256, "max_num_points": 5,'
            ' "max_points": 2048}' % root
        )
        out = tmp_path / "shots"
        cli.main([
            "view", "--config", str(cfg_path), "--info", "data_info.pkl",
            "--frames", "0:1", "--out", str(out), "--image",
        ])
        assert (out / "000000.png").exists()
        assert (out / "000000_cam.png").exists()
        assert (out / "000000_cam.png").stat().st_size > 0

        # --mode 3d: projected orbit-camera scene render via the same CLI
        out3d = tmp_path / "shots3d"
        cli.main([
            "view", "--config", str(cfg_path), "--info", "data_info.pkl",
            "--frames", "0:1", "--out", str(out3d), "--mode", "3d",
            "--azimuth", "45", "--distance", "40",
        ])
        assert (out3d / "000000_3d.png").exists()
        assert (out3d / "000000_3d.png").stat().st_size > 10_000
        # turntable sweep
        out_orb = tmp_path / "orbit"
        cli.main([
            "view", "--config", str(cfg_path), "--info", "data_info.pkl",
            "--frames", "0:1", "--out", str(out_orb), "--mode", "3d",
            "--orbit", "3",
        ])
        sweep = list((out_orb / "000000_3d").glob("az*.png"))
        assert len(sweep) == 3


class TestInteractiveViewer:
    """Key-handler logic of the interactive viewer (reference
    control_panel.py's nav/toggle/screenshot surface) — exercised under Agg:
    everything except plt.show() is backend-agnostic."""

    def _viewer(self, tmp_path, frames=3):
        import pickle

        from det3d_tpu.config import load_config
        from det3d_tpu.viewer.app import SceneViewer

        root = tmp_path / "data"
        (root / "velodyne").mkdir(parents=True)
        infos = []
        for i in range(frames):
            pts = np.random.RandomState(i).rand(200, 4).astype(np.float32) * 20 - 10
            pts.tofile(root / "velodyne" / f"{i:06d}.bin")
            infos.append({
                "image_idx": i,
                "velodyne_path": f"velodyne/{i:06d}.bin",
                "annos": {
                    "name": np.array(["vehicle"]),
                    "location": np.array([[5.0, float(i), -1.0]]),
                    "dimensions": np.array([[4.0, 2.0, 1.6]]),
                    "rotation_y": np.array([0.1 * i]),
                    "score": np.zeros(1),
                },
            })
        with open(root / "data_info.pkl", "wb") as f:
            pickle.dump(infos, f)
        cfg = load_config({
            "data_root": str(root),
            "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
            "voxel_size": [1.0, 1.0, 11.0],
            "max_voxels": 256, "max_num_points": 5, "max_points": 2048,
        })
        return SceneViewer(cfg, info_path="data_info.pkl")

    def test_navigation_toggles_and_screenshot(self, tmp_path):
        from det3d_tpu.viewer.app import InteractiveViewer

        iv = InteractiveViewer(self._viewer(tmp_path), out_dir=tmp_path / "shots")
        assert iv.idx == 0
        iv.handle_key("right")
        assert iv.idx == 1
        iv.handle_key("j")  # vim-style prev
        assert iv.idx == 0
        iv.handle_key("left")  # wraps
        assert iv.idx == 2
        iv.handle_key("home")
        assert iv.idx == 0
        iv.handle_key("end")
        assert iv.idx == 2
        # the redraw actually repopulated the axes for the current frame
        assert len(iv.ax.collections) > 0

        iv.handle_key("v")
        assert iv.show_voxels
        iv.handle_key("v")
        assert not iv.show_voxels

        iv.handle_key("s")
        assert (tmp_path / "shots" / "000002_interactive.png").exists()
        iv.handle_key("q")  # closes without error

    def test_run_refuses_headless_backend(self, tmp_path):
        import pytest

        from det3d_tpu.viewer.app import InteractiveViewer

        iv = InteractiveViewer(self._viewer(tmp_path, frames=1), out_dir=tmp_path)
        with pytest.raises(RuntimeError, match="GUI matplotlib backend"):
            iv.run()
