"""Training application: the reference's `train()` loop, TPU-native.

Mirrors reference train.py:23-162 feature-for-feature — infinite step loop,
running precision/recall printed every `display_step`, checkpoint
(latest + per-step) every `save_step`, in-training eval + mAP appended to
`log.txt` every `eval_step` — with the TPU redesign underneath: the whole
data path past augmentation is on-device inside one jitted train step, and
when multiple devices are visible the step is data-parallel over an ICI mesh
(params replicated, batch sharded; reference has no multi-device path).

Data sources:
  * real: info pickles via `DetectionDataset` (reference GenericDataset);
  * `--synthetic`: generated scenes (data/synthetic.py) so the loop runs
    anywhere.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from det3d_tpu.config import Config
from det3d_tpu.data.synthetic import sample_scene, scene_to_annos
from det3d_tpu.train.checkpoint import CheckpointManager
from det3d_tpu.train.metrics import RunningMetrics
from det3d_tpu.train.trainer import Trainer, host_batch


def _batch_iterator(cfg: Config, synthetic: bool, seed: int = 0, device_augment: bool = False):
    """Yield host TrainBatches forever (reference's dataloader loop,
    train.py:92-99, restarts the iterator at epoch end)."""
    rng = np.random.RandomState(seed)
    if synthetic:
        while True:
            samples = [sample_scene(cfg, rng) for _ in range(cfg.batch_size)]
            yield host_batch(cfg, samples)
    else:
        from det3d_tpu.data.dataset import DetectionDataset
        from det3d_tpu.data.prefetcher import BatchPrefetcher

        ds = DetectionDataset(
            cfg, cfg.train_info, training=True, seed=seed,
            device_global_augment=device_augment,
        )
        # num_workers>0 → forked worker processes do IO+augmentation ahead of
        # the consumer (reference DataLoader workers, train.py:37-55)
        pf = BatchPrefetcher(ds, cfg, cfg.num_workers, seed=seed)
        yield from pf.epochs()


def _eval_samples(cfg: Config, synthetic: bool, n: int, seed: int = 1):
    rng = np.random.RandomState(seed)
    if synthetic:
        samples = [sample_scene(cfg, rng) for _ in range(n)]
        return samples, [scene_to_annos(s, cfg) for s in samples]
    from det3d_tpu.data.dataset import DetectionDataset

    ds = DetectionDataset(cfg, cfg.eval_info, training=False)
    samples, gt_annos = [], []
    for i in range(min(n, len(ds))):
        info = ds.infos[i]
        samples.append({"points": ds.load_points(info)})
        annos = info["annos"]
        gt_annos.append(
            {
                "name": annos["name"],
                "location": annos["location"],
                "dimensions": annos["dimensions"],
                "rotation_y": annos["rotation_y"],
                "num_points": annos.get("num_points", np.full(len(annos["name"]), 100)),
                "score": np.zeros(len(annos["name"])),
            }
        )
    return samples, gt_annos


def run_eval(trainer: Trainer, state, samples, gt_annos, range_thresh: float = 80.0) -> str:
    """In-training eval: infer each frame, official mAP (reference
    train.py:138-161)."""
    from det3d_tpu.eval.ap import get_official_eval_result
    from det3d_tpu.postprocess import to_annos

    cfg = trainer.cfg
    dt_annos = []
    for s in samples:
        pts, n = trainer.detector.pad_points(s["points"])
        det = trainer.eval_step_jit(state, pts, n)
        dt_annos.append(to_annos(cfg, jax.device_get(det)))
    _, eval_str = get_official_eval_result(
        gt_annos, dt_annos, list(cfg.detect_class), range_thresh
    )
    return eval_str


def train(
    cfg: Config,
    *,
    max_steps: int = 10_000_000,
    display_step: int = 50,
    save_step: int = 5000,
    eval_step: int = 5000,
    eval_frames: int = 64,
    synthetic: bool = False,
    model_dir: str | None = None,
    seed: int = 0,
    spatial_shards: int = 1,
    device_augment: bool = False,
) -> None:
    model_dir = Path(model_dir or (Path(cfg.model_path or ".") / cfg.experiment))
    model_dir.mkdir(parents=True, exist_ok=True)
    log_path = model_dir / "log.txt"

    n_dev = len(jax.devices())
    hybrid_mesh = None
    if spatial_shards > 1:
        # hybrid DP×SP: batch over `data`, conv activations sharded over
        # `spatial` — the activation-memory scaling mode for large canvases
        # (parallel/mesh.make_spatial_train)
        from det3d_tpu.parallel.mesh import make_hybrid_mesh, make_spatial_train

        if n_dev % spatial_shards:
            raise ValueError(
                f"--spatial-shards {spatial_shards} must divide the "
                f"{n_dev} visible devices"
            )
        dp = n_dev // spatial_shards
        if cfg.batch_size % max(dp, 1):
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by the "
                f"data-parallel factor {dp} (= devices/spatial_shards)"
            )
        hybrid_mesh = make_hybrid_mesh(dp, spatial_shards)
        trainer, hybrid_step = make_spatial_train(
            cfg, hybrid_mesh, device_global_augment=device_augment, aug_seed=seed
        )
    else:
        # (pure DP over >1 devices runs this trainer's step as the body of
        # a shard_map — parallel/mesh.make_sharded_train_step — so the s2b
        # fence and the other Pallas custom calls execute per-device on
        # local shards; the Trainer default fence stays correct here)
        trainer = Trainer(cfg, device_global_augment=device_augment, aug_seed=seed)
    ckpt = CheckpointManager(model_dir)

    state = trainer.init_state(jax.random.PRNGKey(seed))
    restored = ckpt.restore_latest(state)
    if restored is not None:
        # resume restores params/opt/step but takes the lr from the current
        # config (reference train.py:69-76 overrides lr on restore)
        state = Trainer.override_lr(restored, cfg.learning_rate)
        print(f"resumed from step {int(state.step)} (lr={cfg.learning_rate})")

    if hybrid_mesh is not None:
        from det3d_tpu.parallel.mesh import shard_batch

        step_fn = hybrid_step
        state = jax.device_put(
            state, jax.sharding.NamedSharding(hybrid_mesh, jax.sharding.PartitionSpec())
        )
        place = lambda b: shard_batch(hybrid_mesh, b)
        print(
            f"hybrid {n_dev // spatial_shards}x{spatial_shards} "
            f"(data x spatial) over {n_dev} devices"
        )
    elif n_dev > 1 and cfg.batch_size % n_dev == 0:
        from det3d_tpu.parallel.mesh import make_mesh, make_sharded_train_step, shard_batch

        mesh = make_mesh(n_dev)
        step_fn = make_sharded_train_step(trainer, mesh)
        state = jax.device_put(
            state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
        place = lambda b: shard_batch(mesh, b)
        print(f"data-parallel over {n_dev} devices")
    else:
        step_fn = trainer.train_step_jit
        place = lambda b: b

    metrics = RunningMetrics()
    batches = _batch_iterator(cfg, synthetic, seed, device_augment=device_augment)
    eval_set = None

    t0 = time.perf_counter()
    step = int(state.step)
    pending_counts = []  # device objects; fetched only at display time (a
    # per-step device_get would force a host sync every step)
    while step < max_steps:
        batch = place(next(batches))
        state, loss_dict, counts = step_fn(state, batch)
        step += 1
        pending_counts.append(counts)

        if step % display_step == 0:
            for c in jax.device_get(pending_counts):
                metrics.update(c)
            pending_counts.clear()
            ld = {k: float(v) for k, v in jax.device_get(loss_dict).items()}
            dt = (time.perf_counter() - t0) / display_step
            print(
                f"step {step}  loss {ld['loss']:.4f} (cls {ld['cls_loss']:.4f} "
                f"loc {ld['loc_loss']:.4f} dir {ld['dir_loss']:.4f})  "
                f"{dt * 1e3:.0f} ms/step\n  {metrics}"
            )
            metrics.clear()
            t0 = time.perf_counter()

        if step % save_step == 0:
            ckpt.save(jax.device_get(state))
            print(f"saved checkpoint @ {step}")

        if step % eval_step == 0:
            if eval_set is None:
                eval_set = _eval_samples(cfg, synthetic, eval_frames)
            eval_str = run_eval(trainer, state, *eval_set)
            print(eval_str)
            with open(log_path, "a") as f:
                f.write(f"===== step {step} =====\n{eval_str}\n")
            t0 = time.perf_counter()
