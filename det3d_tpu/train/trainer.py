"""Training step and loop: raw points + gt boxes → loss/grads/update, all
on device under one jit.

TPU-native redesign of the reference's training pipeline (reference:
train.py:23-162). The reference runs voxelization, anchor masking, and target
assignment on CPU dataloader workers (framework/dataset.py:90-175) and
uploads the result per step (framework/utils.py:7-20); here the entire data
path — voxelize → anchors mask → target assignment → forward → loss →
grad-clip → Adam — traces into a single compiled step taking only the padded
point cloud and gt boxes. Optimizer matches the reference: Adam(lr) with
global-norm grad clipping at 10.0 (train.py:60, :107).

`Trainer.train_step_sharded` provides the data-parallel variant: the same
step jit-ted over a `jax.sharding.Mesh` with batch sharded across devices
(the reference has no multi-device path at all; see SURVEY.md §2i).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from det3d_tpu import losses
from det3d_tpu.config import Config
from det3d_tpu.pipeline import Detector
from det3d_tpu.targets import make_target_assigner
from det3d_tpu.train.metrics import binary_counts


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


class TrainBatch(NamedTuple):
    """Static-shape host batch (see data/dataset.py for construction)."""

    points: jax.Array      # (B, max_points, C)
    num_points: jax.Array  # (B,)
    gt_boxes: jax.Array    # (B, G, 7)
    gt_classes: jax.Array  # (B, G) int32, 1-based
    gt_valid: jax.Array    # (B, G) bool


class Trainer:
    def __init__(
        self,
        cfg: Config,
        detector: Detector | None = None,
        *,
        s2b_fence: bool = True,
        device_global_augment: bool = False,
        aug_seed: int = 0,
    ):
        self.cfg = cfg
        self.use_s2b_fence = s2b_fence
        # on-device global augmentation: the host pipeline keeps only the
        # per-object noise (its collision search is inherently sequential);
        # flip/rotate/scale/translate run as jnp inside the jitted step
        # (data/augment.apply_global_augment). Pair with
        # DetectionDataset(device_global_augment=True) so the host chain
        # skips its global transforms.
        self.device_global_augment = device_global_augment
        self._aug_key = (
            jax.random.PRNGKey(aug_seed) if device_global_augment else None
        )
        self.detector = detector or Detector(cfg)
        self.assigner = make_target_assigner(cfg, self.detector.anchor_set)
        # lr lives inside opt_state (inject_hyperparams) so a resumed run can
        # override it, as the reference does on restore (train.py:76)
        inner = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate)
        self.optimizer = optax.chain(optax.clip_by_global_norm(10.0), inner)

    @staticmethod
    def override_lr(state: "TrainState", lr: float) -> "TrainState":
        """Set the learning rate inside a (restored) TrainState."""
        import jax.numpy as jnp

        inner = state.opt_state[1]
        hp = dict(inner.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        new_inner = inner._replace(hyperparams=hp)
        return state._replace(opt_state=(state.opt_state[0], new_inner))

    # -- state -------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        variables = self.detector.init_variables(rng)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
        )

    # -- the step ----------------------------------------------------------
    def _device_augment_one(self, points, gt_boxes, gt_valid, key):
        """Global flip/rotate/scale/translate on device, then the host path's
        post-augment range filter + yaw wrap (data/dataset.py:126-129) as a
        gt_valid mask update (static shapes). Padded point rows transform
        harmlessly — the voxelizer masks by true count, not values."""
        from det3d_tpu.data.augment import global_augment_device
        from det3d_tpu.ops.geometry import filter_gt_box_outside_range, limit_period

        points, gt_boxes = global_augment_device(points, gt_boxes, key)
        dr = self.cfg.detection_range
        keep = filter_gt_box_outside_range(gt_boxes, (dr[0], dr[1], dr[3], dr[4]))
        # 2π wrap like the host path (utils.npmath.limit_period_np, period=2π);
        # limit_period's π default would alias headings that differ by π and
        # destroy the direction targets (targets.py dir = rot_gt > 0)
        gt_boxes = gt_boxes.at[:, 6].set(
            limit_period(gt_boxes[:, 6], period=2 * np.pi)
        )
        return points, gt_boxes, gt_valid & keep

    def _prepare(self, batch: TrainBatch, aug_key: jax.Array | None = None):
        """Per-sample on-device preprocessing + target assignment.

        Unrolled over the (static, small) batch instead of vmapped: under
        vmap the voxelizer's segment-window row gather and grouping sort
        lower to batched gathers/sorts that run several times slower than
        their per-sample forms (traced: 3.97 ms vs 2x0.33 ms for the gather,
        2.05 vs 2x0.26 for the sort at b=2 — tools/trace_train.py). The
        unrolled graphs are identical to the single-frame inference path,
        which is kept fast deliberately. vmap remains for large batches
        where graph duplication would bloat compile time."""

        def one(points, num_points, gt_boxes, gt_classes, gt_valid, key=None):
            if key is not None:
                points, gt_boxes, gt_valid = self._device_augment_one(
                    points, gt_boxes, gt_valid, key
                )
            frame, anchors_mask = self.detector.preprocess(points, num_points)
            tgt = self.assigner(gt_boxes, gt_classes, gt_valid, anchors_mask)
            return frame, anchors_mask, tgt

        b = batch.points.shape[0]
        keys = None if aug_key is None else jax.random.split(aug_key, b)
        if b > 8:
            args = (
                batch.points, batch.num_points, batch.gt_boxes,
                batch.gt_classes, batch.gt_valid,
            ) + (() if keys is None else (keys,))
            return jax.vmap(one)(*args)
        per_sample = [
            one(
                batch.points[i], batch.num_points[i], batch.gt_boxes[i],
                batch.gt_classes[i], batch.gt_valid[i],
                None if keys is None else keys[i],
            )
            for i in range(b)
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per_sample)

    def train_step(
        self,
        state: TrainState,
        batch: TrainBatch,
        axis_name: str | None = None,
    ):
        """One optimizer step. With `axis_name` set, the step runs as the
        PER-DEVICE body of a `shard_map` over that mesh axis (the batch is
        the local shard): gradients/losses `pmean`, metric counts `psum`,
        and batch stats `pmean` across devices, then the identical update is
        applied everywhere — the data-parallel decomposition that keeps the
        Pallas custom calls (matcher, scatter, fences) per-device instead of
        forcing GSPMD to replicate them (parallel/mesh.make_sharded_train_step)."""
        aug_key = (
            None
            if self._aug_key is None
            else jax.random.fold_in(self._aug_key, state.step)
        )
        if aug_key is not None and axis_name is not None:
            # decorrelate per-device augmentation draws: inside shard_map
            # every device sees the same replicated step counter
            aug_key = jax.random.fold_in(aug_key, jax.lax.axis_index(axis_name))
        frame, anchors_mask, tgt = self._prepare(batch, aug_key)

        def loss_fn(params):
            preds, updates = self.detector.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                frame.voxels,
                frame.num_points_per_voxel,
                frame.coors,
                train=True,
                # sync-BN: under shard_map the PFN batch statistics psum
                # over the data axis — exactly the full-global-batch values
                axis_name=axis_name,
                mutable=["batch_stats"],
            )
            if self.use_s2b_fence:
                # deliberate no-op custom call: keeps XLA's space-to-batch
                # conv transform OUT of the training graph, where it costs
                # far more in relayout copies + fusion fragmentation than
                # the b>=2 convs gain (kernels/fence_pallas.py; the batch-1
                # inference path keeps the transform — it wins there).
                # Fencing cls_preds alone suffices: every RPN conv feeds it
                # through the shared trunk, and it is the smallest head
                # output (measured: 63.9 → 54.9 ms/step with all three
                # fenced; the box/dir fences only added copy cost).
                from det3d_tpu.kernels.fence_pallas import s2b_fence

                preds = dict(preds, cls_preds=s2b_fence(preds["cls_preds"]))
            loss_dict = losses.detection_loss(
                preds, tgt.labels, tgt.bbox_targets, tgt.dir_targets
            )
            return loss_dict["loss"], (loss_dict, updates["batch_stats"], preds)

        grads, (loss_dict, new_stats, preds) = jax.grad(loss_fn, has_aux=True)(state.params)
        if self.use_s2b_fence:
            # the forward fence only covers convs upstream of the loss; the
            # wgrad convolutions' outputs are the grads themselves — fence
            # them so the backward convs skip space-to-batch as well
            from det3d_tpu.kernels.fence_pallas import fence_any

            grads = jax.tree.map(fence_any, grads)
        metrics = binary_counts(tgt.labels, preds["cls_preds"])
        if axis_name is not None:
            # per-sample-normalized losses mean over the batch, so pmean of
            # the local means == the full-batch value; metric counts sum.
            # batch_stats need NO collective: the MaskedBatchNorm sync-BN
            # already psums its masked sums/counts, so every device computed
            # the identical full-global-batch statistics.
            grads = jax.lax.pmean(grads, axis_name)
            loss_dict = jax.lax.pmean(loss_dict, axis_name)
            metrics = jax.tree.map(lambda x: jax.lax.psum(x, axis_name), metrics)
        updates, new_opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss_dict, metrics

    @functools.cached_property
    def train_step_jit(self):
        return jax.jit(self.train_step, donate_argnums=(0,))

    # -- eval forward (for the in-training eval loop) -----------------------
    def eval_step(self, state: TrainState, points: jax.Array, num_points: jax.Array):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return self.detector.infer(variables, points, num_points)

    @functools.cached_property
    def eval_step_jit(self):
        """Compiled eval forward. Uses the detector's staged dispatch (on
        TPU: candidates | NMS as two programs) so in-training eval keeps the
        space-to-batch convs — a single fused jit here would put the NMS
        custom call downstream of the RPN and slow every conv ~3x (see
        pipeline.Detector.infer_jit)."""
        det = self.detector

        def eval_fn(state, points, num_points):
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            return det.infer_jit(variables, points, num_points)

        return eval_fn


def host_batch(cfg: Config, samples: list[dict]) -> TrainBatch:
    """Collate host samples (each with 'points', 'gt_boxes', 'gt_classes')
    into a static-shape TrainBatch. Counterpart of merge_second_batch
    (reference: framework/utils.py:23-48) under the pad-to-max contract."""
    b = len(samples)
    c = cfg.num_point_features
    g = cfg.max_gt_boxes
    points = np.zeros((b, cfg.max_points, c), np.float32)
    num_points = np.zeros((b,), np.int32)
    gt_boxes = np.zeros((b, g, 7), np.float32)
    gt_boxes[..., 3:6] = 1.0
    gt_classes = np.zeros((b, g), np.int32)
    gt_valid = np.zeros((b, g), bool)
    for i, s in enumerate(samples):
        pts = s["points"]
        n = min(pts.shape[0], cfg.max_points)
        points[i, :n] = pts[:n]
        num_points[i] = n
        gb = s.get("gt_boxes", np.zeros((0, 7), np.float32))
        ng = min(gb.shape[0], g)
        gt_boxes[i, :ng] = gb[:ng]
        if ng and "gt_classes" not in s:
            raise KeyError(
                "sample has gt_boxes but no gt_classes — every box needs a "
                "1-based class id (reference merge_second_batch carries both)")
        gt_classes[i, :ng] = np.asarray(s.get("gt_classes", ()), np.int32)[:ng]
        gt_valid[i, :ng] = True
    return TrainBatch(
        points=points, num_points=num_points, gt_boxes=gt_boxes,
        gt_classes=gt_classes, gt_valid=gt_valid,
    )
