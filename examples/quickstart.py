"""Quickstart: train briefly on synthetic scenes, run inference, evaluate,
render a BEV frame — the whole API surface in ~40 lines.

Counterpart of the reference's eval/example.py. Runs anywhere (forces the
CPU backend with a small geometry so it finishes in ~2 minutes):

    python examples/quickstart.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from det3d_tpu import Detector, Trainer, load_config
from det3d_tpu.data.synthetic import sample_scene, scene_to_annos
from det3d_tpu.eval.ap import get_official_eval_result
from det3d_tpu.postprocess import to_annos
from det3d_tpu.train.trainer import host_batch
from det3d_tpu.viewer.render import render_scene

cfg = load_config(
    {
        "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
        "voxel_size": [0.5, 0.5, 11.0],
        "max_voxels": 1024,
        "max_num_points": 10,
        "max_points": 8192,
        "batch_size": 2,
        "compute_dtype": "float32",
        "learning_rate": 2e-3,
    }
)

# -- train a few hundred steps on generated scenes --------------------------
trainer = Trainer(cfg)
state = trainer.init_state(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
for step in range(200):
    batch = host_batch(cfg, [sample_scene(cfg, rng) for _ in range(cfg.batch_size)])
    state, loss, _ = trainer.train_step_jit(state, jax.device_put(batch))
    if step % 50 == 0:
        print(f"step {step:4d}  loss {float(loss['loss']):.3f}")

# -- inference + official mAP on held-out scenes -----------------------------
eval_rng = np.random.RandomState(99)
scenes = [sample_scene(cfg, eval_rng) for _ in range(8)]
gt_annos = [scene_to_annos(s, cfg) for s in scenes]
dt_annos = []
for s in scenes:
    pts, n = trainer.detector.pad_points(s["points"])
    det = trainer.eval_step_jit(state, pts, n)
    dt_annos.append(to_annos(cfg, jax.device_get(det)))
_, table = get_official_eval_result(gt_annos, dt_annos, list(cfg.detect_class), 80.0)
print(table)

# -- render the first scene with FP/FN coloring ------------------------------
d = dt_annos[0]
dt_boxes = (
    np.concatenate([d["location"], d["dimensions"], d["rotation_y"][:, None]], 1)
    if len(d["name"])
    else np.zeros((0, 7))
)
path = render_scene(
    scenes[0]["points"], scenes[0]["gt_boxes"], dt_boxes, d["score"],
    "quickstart_scene.png", (-16, -16, 16, 16), title="quickstart",
)
print(f"wrote {path}")
