"""Multi-device sharding tests on the 8-virtual-CPU-device mesh (conftest).

The reference has no distributed path at all (single cuda:0, SURVEY §2i);
these pin the data-parallel design: batch sharded on the leading axis,
params replicated, results identical to the unsharded computation.
"""

import jax
import numpy as np
import pytest

from det3d_tpu.parallel.mesh import (
    batch_sharded,
    make_mesh,
    make_sharded_infer,
    make_sharded_train_step,
    replicated,
    shard_batch,
)
from det3d_tpu.train.trainer import Trainer, host_batch
from helpers import small_cfg


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _samples(cfg, k, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(k):
        pts = np.concatenate(
            [rng.uniform(-7, 7, (400, 2)), rng.uniform(-2, 6, (400, 1)),
             rng.uniform(0, 1, (400, 1))], 1).astype(np.float32)
        gt = np.array([[0.0, 0.0, -1.5, 4.6, 2.1, 1.8, 0.3]], np.float32)
        out.append({"points": pts, "gt_boxes": gt, "gt_classes": np.array([1], np.int32)})
    return out


class TestShardedTrain:
    def test_sharded_step_matches_single_device(self, mesh):
        cfg = small_cfg().replace(batch_size=8)
        trainer = Trainer(cfg)
        batch = host_batch(cfg, _samples(cfg, 8))

        state1 = trainer.init_state(jax.random.PRNGKey(0))
        new1, loss1, _ = trainer.train_step_jit(state1, jax.device_put(batch))

        state8 = trainer.init_state(jax.random.PRNGKey(0))
        state8 = jax.device_put(state8, replicated(mesh))
        step8 = make_sharded_train_step(trainer, mesh)
        new8, loss8, _ = step8(state8, shard_batch(mesh, batch))

        np.testing.assert_allclose(
            float(loss1["loss"]), float(loss8["loss"]), rtol=1e-5
        )
        # updated params must match (grads all-reduce == full-batch grads);
        # atol absorbs reduction-order noise amplified by Adam's rsqrt
        for a, b in zip(jax.tree.leaves(new1.params), jax.tree.leaves(new8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)

    def test_sharded_step_blocked_train_matches_single_device(self, mesh):
        """Config.block0_blocked_train under shard_map DP: inside the
        per-device body the canvas is unsharded, so the blocked scatter +
        its VJP run per device — the all-reduced grads must still equal the
        full-batch single-device step. small_cfg's 16² grid disables
        blocking, so this uses a 32² grid (nblk=2)."""
        from det3d_tpu.config import load_config

        cfg = load_config({
            "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
            "center_limit": [-16.0, -16.0, -10.0, 16.0, 16.0, 10.0],
            "voxel_size": [1.0, 1.0, 11.0],
            "max_voxels": 256, "max_num_points": 5, "batch_size": 8,
            "max_points": 4096, "max_gt_boxes": 8, "compute_dtype": "float32",
            "block0_blocked_train": True,
        })
        trainer = Trainer(cfg)
        batch = host_batch(cfg, _samples(cfg, 8))

        state1 = trainer.init_state(jax.random.PRNGKey(0))
        new1, loss1, _ = trainer.train_step_jit(state1, jax.device_put(batch))

        state8 = trainer.init_state(jax.random.PRNGKey(0))
        state8 = jax.device_put(state8, replicated(mesh))
        step8 = make_sharded_train_step(trainer, mesh)
        new8, loss8, _ = step8(state8, shard_batch(mesh, batch))

        np.testing.assert_allclose(
            float(loss1["loss"]), float(loss8["loss"]), rtol=1e-5
        )
        for a, b in zip(jax.tree.leaves(new1.params), jax.tree.leaves(new8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)

    def test_sharded_steps_chain(self, mesh):
        """Multiple consecutive sharded steps keep loss finite and params
        synchronized (output sharding respected across the donate cycle)."""
        cfg = small_cfg().replace(batch_size=8)
        trainer = Trainer(cfg)
        step8 = make_sharded_train_step(trainer, mesh)
        state = jax.device_put(trainer.init_state(jax.random.PRNGKey(0)), replicated(mesh))
        for i in range(3):
            batch = shard_batch(mesh, host_batch(cfg, _samples(cfg, 8, seed=i)))
            state, loss, _ = step8(state, batch)
            assert np.isfinite(float(loss["loss"]))
        assert int(state.step) == 3


class TestShardedInfer:
    def test_batched_sharded_infer_matches_per_frame(self, mesh):
        from det3d_tpu.pipeline import Detector

        cfg = small_cfg()
        det = Detector(cfg)
        v = det.init_variables(jax.random.PRNGKey(0))
        samples = _samples(cfg, 8, seed=3)

        pts = np.stack([det.pad_points(s["points"])[0] for s in samples])
        cnt = np.array([det.pad_points(s["points"])[1] for s in samples], np.int32)

        infer8 = make_sharded_infer(det, mesh)
        out = infer8(jax.device_put(v, replicated(mesh)),
                     jax.device_put(pts, batch_sharded(mesh)),
                     jax.device_put(cnt, batch_sharded(mesh)))

        for i in (0, 3, 7):
            single = det.infer_jit(v, pts[i], cnt[i])
            np.testing.assert_allclose(
                np.asarray(out.scores)[i], np.asarray(single.scores), atol=1e-5
            )
            np.testing.assert_array_equal(
                np.asarray(out.valid)[i], np.asarray(single.valid)
            )

        # the TPU default splits candidates | NMS into two chained sharded
        # dispatches (space-to-batch survives); same detections required
        infer8_staged = make_sharded_infer(det, mesh, two_stage=True)
        out2 = infer8_staged(jax.device_put(v, replicated(mesh)),
                             jax.device_put(pts, batch_sharded(mesh)),
                             jax.device_put(cnt, batch_sharded(mesh)))
        np.testing.assert_allclose(
            np.asarray(out2.scores), np.asarray(out.scores), atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(out2.valid), np.asarray(out.valid))


class TestSpatialInfer:
    def test_spatially_partitioned_infer_matches_single_device(self, mesh):
        """Canvas pinned sharded on x (PointPillars.canvas_sharding) → GSPMD
        partitions the conv stack across the mesh; final detections must
        match the unsharded single-device path exactly."""
        from det3d_tpu.parallel.mesh import make_spatial_infer
        from det3d_tpu.pipeline import Detector

        cfg = small_cfg()
        det_sp, infer_sp = make_spatial_infer(cfg, mesh)
        v = det_sp.init_variables(jax.random.PRNGKey(0))

        det_1 = Detector(cfg)
        sample = _samples(cfg, 1, seed=5)[0]
        pts, n = det_1.pad_points(sample["points"])

        out_sp = infer_sp(v, pts, n)
        out_1 = det_1.infer_jit(v, pts, n)

        # tolerance absorbs cross-shard reduction-order noise in the
        # InstanceNorm statistics (per-shard partial sums combine in a
        # different order than the single-device column reduce)
        np.testing.assert_allclose(
            np.asarray(out_sp.scores), np.asarray(out_1.scores), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out_sp.boxes), np.asarray(out_1.boxes),
            rtol=5e-3, atol=1e-2,
        )
        np.testing.assert_array_equal(
            np.asarray(out_sp.valid), np.asarray(out_1.valid)
        )

    def test_spatial_partitioning_actually_shards_convs(self, mesh):
        """The compiled stage-1 program must contain cross-device halo
        communication (collective-permute / all-gather) — i.e. the conv
        stack genuinely partitions instead of silently replicating."""
        from det3d_tpu.parallel.mesh import make_spatial_infer

        cfg = small_cfg()
        det_sp, _ = make_spatial_infer(cfg, mesh)
        v = det_sp.init_variables(jax.random.PRNGKey(0))
        pts = np.zeros((cfg.max_points, 4), np.float32)

        import jax.numpy as jnp

        lowered = jax.jit(
            det_sp.infer_candidates,
            in_shardings=(
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
            ) * 3,
        ).lower(v, jnp.asarray(pts), jnp.int32(16))
        txt = lowered.compile().as_text()
        assert ("collective-permute" in txt) or ("all-gather" in txt), (
            "no halo-exchange collectives in the spatially-sharded program"
        )


class TestSpatialTrain:
    def test_hybrid_step_matches_single_device(self):
        """Hybrid DP×SP (2 data × 4 spatial): one train step must match the
        single-device step — batch grads all-reduce over `data` while every
        conv activation is spatially sharded over `spatial`."""
        from det3d_tpu.parallel.mesh import make_hybrid_mesh, make_spatial_train

        cfg = small_cfg().replace(batch_size=2)
        batch = host_batch(cfg, _samples(cfg, 2))

        trainer1 = Trainer(cfg, s2b_fence=False)
        state1 = trainer1.init_state(jax.random.PRNGKey(0))
        new1, loss1, _ = trainer1.train_step_jit(state1, jax.device_put(batch))

        mesh = make_hybrid_mesh(dp=2, sp=4)
        trainer_sp, step_sp = make_spatial_train(cfg, mesh)
        state_sp = jax.device_put(
            trainer_sp.init_state(jax.random.PRNGKey(0)), replicated(mesh)
        )
        new_sp, loss_sp, _ = step_sp(state_sp, shard_batch(mesh, batch))

        # rtol absorbs cross-shard reduction-order noise in the InstanceNorm
        # statistics (spatial partial sums combine in a different order)
        np.testing.assert_allclose(
            float(loss1["loss"]), float(loss_sp["loss"]), rtol=1e-4
        )
        # atol absorbs that noise amplified by Adam's rsqrt: near-zero grad
        # components can flip sign, bounding the divergence by ~2·lr
        for a, b in zip(jax.tree.leaves(new1.params), jax.tree.leaves(new_sp.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)

    def test_hybrid_steps_chain(self):
        from det3d_tpu.parallel.mesh import make_hybrid_mesh, make_spatial_train

        cfg = small_cfg().replace(batch_size=2)
        mesh = make_hybrid_mesh(dp=2, sp=4)
        trainer_sp, step_sp = make_spatial_train(cfg, mesh)
        state = jax.device_put(
            trainer_sp.init_state(jax.random.PRNGKey(0)), replicated(mesh)
        )
        for i in range(2):
            batch = shard_batch(mesh, host_batch(cfg, _samples(cfg, 2, seed=i)))
            state, loss, _ = step_sp(state, batch)
            assert np.isfinite(float(loss["loss"]))
        assert int(state.step) == 2

    def test_hybrid_train_actually_shards_convs(self):
        """The compiled hybrid step must contain cross-device halo
        communication — the conv stack genuinely partitions spatially in the
        training graph (fwd + bwd), not just in inference."""
        from det3d_tpu.parallel.mesh import make_hybrid_mesh, make_spatial_train

        cfg = small_cfg().replace(batch_size=2)
        mesh = make_hybrid_mesh(dp=2, sp=4)
        trainer_sp, _ = make_spatial_train(cfg, mesh)
        state = trainer_sp.init_state(jax.random.PRNGKey(0))
        batch = host_batch(cfg, _samples(cfg, 2))
        lowered = jax.jit(
            trainer_sp.train_step,
            in_shardings=(replicated(mesh), batch_sharded(mesh)),
            out_shardings=(replicated(mesh),) * 3,
        ).lower(state, batch)
        txt = lowered.compile().as_text()
        assert ("collective-permute" in txt) or ("all-gather" in txt), (
            "no halo-exchange collectives in the hybrid-sharded train step"
        )
        assert "all-reduce" in txt, "no gradient all-reduce in the hybrid step"


class TestScalingStructure:
    """Structural scaling evidence across mesh sizes (docs/SCALING.md table,
    regenerable with tools/scaling_evidence.py): the collectives XLA inserts
    are a compile-time fact this rig CAN verify, even though multi-chip
    timing needs real chips."""

    @pytest.mark.parametrize("dp", [2, 4, 8])
    def test_dp_step_has_exactly_the_written_reductions(self, dp):
        """The shard_map DP step's cross-device traffic is EXACTLY four
        all-reduces regardless of mesh size — one per reduction group
        written in the step (gradient pmean, loss-dict pmean, metric-count
        psum, sync-BN statistics pmean; Trainer.train_step + PFN), each
        merged from its per-leaf reduces by XLA's all-reduce combiner —
        and no spatial communication at all."""
        from det3d_tpu.parallel.mesh import (
            batch_sharded,
            collective_counts,
            make_mesh,
            make_sharded_train_step,
            replicated,
        )

        cfg = small_cfg().replace(batch_size=dp)
        trainer = Trainer(cfg)
        batch = host_batch(cfg, _samples(cfg, dp))
        mesh = make_mesh(dp)
        state = jax.device_put(
            trainer.init_state(jax.random.PRNGKey(0)), replicated(mesh)
        )
        step = make_sharded_train_step(trainer, mesh)
        txt = (
            step.lower(state, jax.device_put(batch, batch_sharded(mesh)))
            .compile().as_text()
        )
        counts = collective_counts(txt)
        assert counts.get("all-reduce") == 4, counts
        assert "collective-permute" not in counts, counts

    @pytest.mark.parametrize("sp", [2, 4, 8])
    def test_spatial_infer_halo_count_is_mesh_size_invariant(self, sp):
        """The spatially-partitioned candidates stage contains one halo
        collective-permute per partitioned conv — an SPMD program, so the
        count stays ~constant as the mesh grows (per-device traffic shrinks
        with the shard, it does not multiply). Measured 25-27 permutes /
        12-14 gathers over sp=2/4/8 (tools/scaling_evidence.py)."""
        import jax.numpy as jnp

        from det3d_tpu.parallel.mesh import (
            collective_counts,
            make_spatial_infer,
            make_spatial_mesh,
            replicated,
        )

        cfg = small_cfg()
        mesh = make_spatial_mesh(sp)
        det_sp, _ = make_spatial_infer(cfg, mesh)
        v = det_sp.init_variables(jax.random.PRNGKey(0))
        pts = np.zeros((cfg.max_points, 4), np.float32)
        rep = replicated(mesh)
        txt = (
            jax.jit(det_sp.infer_candidates, in_shardings=(rep, rep, rep))
            .lower(v, jnp.asarray(pts), jnp.int32(16))
            .compile().as_text()
        )
        counts = collective_counts(txt)
        assert 20 <= counts.get("collective-permute", 0) <= 40, counts
        assert counts.get("all-gather", 0) >= 1, counts

    def test_hybrid_step_has_both_traffic_kinds(self):
        """Hybrid DP×SP: gradient all-reduces over `data` AND fwd+bwd conv
        halos over `spatial` in one program (bwd roughly triples the permute
        count vs inference — dgrad + wgrad each need halos)."""
        from det3d_tpu.parallel.mesh import (
            batch_sharded,
            collective_counts,
            make_hybrid_mesh,
            make_spatial_train,
            replicated,
        )

        cfg = small_cfg().replace(batch_size=2)
        mesh = make_hybrid_mesh(dp=2, sp=4)
        trainer_sp, step_sp = make_spatial_train(cfg, mesh)
        state = jax.device_put(
            trainer_sp.init_state(jax.random.PRNGKey(0)), replicated(mesh)
        )
        batch = jax.device_put(
            host_batch(cfg, _samples(cfg, 2)), batch_sharded(mesh)
        )
        counts = collective_counts(step_sp.lower(state, batch).compile().as_text())
        assert counts.get("all-reduce", 0) >= 3, counts
        assert counts.get("collective-permute", 0) >= 60, counts


class TestPreparePaths:
    def test_unrolled_prepare_matches_vmap(self):
        """The b<=8 unrolled per-sample preparation (a TPU perf fix: batched
        gathers/sorts under vmap serialize) must produce exactly what the
        vmapped form produces."""
        cfg = small_cfg(batch_size=2)
        trainer = Trainer(cfg)
        batch = jax.device_put(host_batch(cfg, _samples(cfg, 2, seed=3)))

        unrolled = trainer._prepare(batch)

        def vmapped(b):
            def one(points, num_points, gt_boxes, gt_classes, gt_valid):
                frame, anchors_mask = trainer.detector.preprocess(points, num_points)
                tgt = trainer.assigner(gt_boxes, gt_classes, gt_valid, anchors_mask)
                return frame, anchors_mask, tgt

            return jax.vmap(one)(
                b.points, b.num_points, b.gt_boxes, b.gt_classes, b.gt_valid
            )

        ref = vmapped(batch)
        for a, b in zip(jax.tree.leaves(unrolled), jax.tree.leaves(ref)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
