"""Scale test of the AP eval harness at ~1000 frames (round-2 judge #9).

The reference numba-jits its matcher and rotated-IoU device functions
(reference eval/eval.py + eval/iou.py); this rebuild's vectorized
all-thresholds matcher (eval/ap.py:119-159) and frame-batched O(1)-dispatch
overlaps should handle a 1000-frame eval in minutes on CPU. This script
proves it with a number, recorded in BASELINE.md.

    python tools/eval_scale_test.py [--frames 1000]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fabricate(frames: int, seed: int = 0):
    """gt: synthetic scenes; dt: jittered gt + score noise + false positives —
    realistic match structure without running the network 1000 times."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from det3d_tpu.config import load_config
    from det3d_tpu.data.synthetic import sample_scene, scene_to_annos

    cfg = load_config("configs/ntusl_20cm.json")
    rng = np.random.RandomState(seed)
    gt_annos, dt_annos = [], []
    for _ in range(frames):
        s = sample_scene(cfg, rng, ground_points=0)
        gt = scene_to_annos(s, cfg)
        gt_annos.append(gt)

        n = len(gt["name"])
        keep = rng.rand(n) > 0.15  # ~85% recall
        loc = gt["location"][keep] + rng.normal(0, 0.25, (keep.sum(), 3))
        dim = gt["dimensions"][keep] * rng.uniform(0.9, 1.1, (keep.sum(), 3))
        yaw = gt["rotation_y"][keep] + rng.normal(0, 0.05, keep.sum())
        name = gt["name"][keep]
        # false positives
        nfp = rng.randint(0, 4)
        fp_loc = np.concatenate(
            [rng.uniform(-70, 70, (nfp, 2)), np.full((nfp, 1), -1.0)], axis=1
        )
        dt_annos.append(
            {
                "name": np.concatenate([name, rng.choice(["vehicle", "pedestrian", "cyclist"], nfp)]),
                "location": np.concatenate([loc, fp_loc]),
                "dimensions": np.concatenate([dim, np.abs(rng.normal([4, 2, 1.7], 0.3, (nfp, 3)))]),
                "rotation_y": np.concatenate([yaw, rng.uniform(-np.pi, np.pi, nfp)]),
                "score": rng.uniform(0.05, 1.0, keep.sum() + nfp),
            }
        )
    return gt_annos, dt_annos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    args = ap.parse_args()

    from det3d_tpu.eval.ap import get_official_eval_result

    t0 = time.perf_counter()
    gt_annos, dt_annos = fabricate(args.frames)
    t_gen = time.perf_counter() - t0
    n_gt = sum(len(a["name"]) for a in gt_annos)
    n_dt = sum(len(a["name"]) for a in dt_annos)
    print(f"fabricated {args.frames} frames ({n_gt} gt, {n_dt} dt boxes) in {t_gen:.1f}s")

    t0 = time.perf_counter()
    results, s = get_official_eval_result(
        gt_annos, dt_annos, ["vehicle", "pedestrian", "cyclist"], 80.0
    )
    t_eval = time.perf_counter() - t0
    print(s)
    print(f"EVAL WALL TIME: {t_eval:.1f}s for {args.frames} frames (BEV+3D, 3 classes, all thresholds)")


if __name__ == "__main__":
    main()
