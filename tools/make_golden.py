"""Regenerate the frozen end-to-end golden regression assets.

This formalizes the reference's de-facto end-to-end cross-check — its
inference variants validating each other frame-by-frame (reference:
framework/inference.py:258-448, infer_v2/infer_v3) — as stored artifacts:
fixed weights + frozen synthetic frames → post-NMS boxes/scores/valid,
CPU float32. A refactor that shifts the decode/top-k/NMS interplay inside
the tolerance of every per-op unit test still fails the composed check.

Two assets:
  e2e_small.npz  tiny 32² grid (exact top-k — the CPU default): fast guard
  e2e_mid.npz    200² grid (fms 100², NOT a production size) with the
                 TPU-default bucketed approximate top-k FORCED ON — pins the
                 tile/padding arithmetic and the approx-top-k selection that
                 the tiny geometry cannot exercise

Run ONLY when an intentional behavior change moves final detections:

    python tools/make_golden.py

then commit the updated tests/golden/*.npz alongside the change.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
N_FRAMES = 6
N_FRAMES_MID = 4


def param_fingerprint(variables) -> np.ndarray:
    """Order-stable per-leaf (sum, abs-sum) over all variables: separates
    "the init changed" (fingerprint mismatch) from "the pipeline changed"
    (fingerprint match, detections differ) in test failures."""
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(variables)
    rows = []
    for path, leaf in sorted(leaves, key=lambda kv: jax.tree_util.keystr(kv[0])):
        a = np.asarray(leaf, np.float64)
        rows.append([float(a.sum()), float(np.abs(a).sum())])
    return np.asarray(rows, np.float64)


def mid_cfg():
    """Mid geometry: big enough for real tiling/padding paths (fms 100² is
    deliberately NOT a production size or a power of two), small enough to
    compile and run on CPU in seconds."""
    from det3d_tpu.config import load_config

    return load_config(
        {
            "detection_range": [-50.0, -50.0, -2.5, 50.0, 50.0, 8.5],
            "center_limit": [-50.0, -50.0, -10.0, 50.0, 50.0, 10.0],
            "voxel_size": [0.5, 0.5, 11.0],
            "max_voxels": 2000,
            "max_num_points": 8,
            "max_points": 20000,
            "max_gt_boxes": 16,
            "compute_dtype": "float32",
        }
    )


def make_detector(which: str):
    """The exact detector construction the tests must mirror."""
    import __graft_entry__ as g
    from det3d_tpu.pipeline import Detector

    if which == "small":
        return Detector(g._small_cfg())
    from det3d_tpu.postprocess import PostProcessParams

    # force the TPU-default bucketed top-k on the CPU golden so its
    # bucket/tile arithmetic is pinned platform-independently
    return Detector(mid_cfg(), postprocess_params=PostProcessParams(approx_topk=True))


def build(which: str, n_frames: int, scene_kwargs: dict) -> None:
    import jax

    import __graft_entry__  # noqa: F401  (forces the CPU platform hook below)

    from det3d_tpu.data.synthetic import sample_scene

    det = make_detector(which)
    variables = det.init_variables(jax.random.PRNGKey(0))

    rng = np.random.RandomState(42)
    out = {"fingerprint": param_fingerprint(variables)}
    for i in range(n_frames):
        s = sample_scene(det.cfg, rng, **scene_kwargs)
        pts, n = det.pad_points(s["points"])
        d = jax.device_get(det.infer_jit(variables, pts, np.int32(n)))
        out[f"points_{i}"] = pts
        out[f"num_{i}"] = np.int32(n)
        out[f"boxes_{i}"] = np.asarray(d.boxes, np.float32)
        out[f"scores_{i}"] = np.asarray(d.scores, np.float32)
        out[f"valid_{i}"] = np.asarray(d.valid, bool)
        print(f"[{which}] frame {i}: {int(out[f'valid_{i}'].sum())} detections")

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"e2e_{which}.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    build("small", N_FRAMES, {"num_objects": (2, 6), "ground_points": 1200})
    build("mid", N_FRAMES_MID, {"num_objects": (4, 10), "ground_points": 9000})


if __name__ == "__main__":
    main()
