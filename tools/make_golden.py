"""Regenerate the frozen end-to-end golden regression asset.

This formalizes the reference's de-facto end-to-end cross-check — its
inference variants validating each other frame-by-frame (reference:
framework/inference.py:258-448, infer_v2/infer_v3) — as a stored artifact:
fixed weights + frozen synthetic frames → post-NMS boxes/scores/valid,
CPU float32. A refactor that shifts the decode/top-k/NMS interplay inside
the tolerance of every per-op unit test still fails the composed check.

Run ONLY when an intentional behavior change moves final detections:

    python tools/make_golden.py

then commit the updated tests/golden/e2e_small.npz alongside the change.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "e2e_small.npz")
N_FRAMES = 6


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


def build(path: str = GOLDEN) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import __graft_entry__ as g
    from det3d_tpu.data.synthetic import sample_scene
    from det3d_tpu.pipeline import Detector

    cfg = g._small_cfg()
    det = Detector(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))

    rng = np.random.RandomState(42)
    out = {"fingerprint": param_fingerprint(variables)}
    for i in range(N_FRAMES):
        s = sample_scene(cfg, rng, num_objects=(2, 6), ground_points=1200)
        pts, n = det.pad_points(s["points"])
        d = jax.device_get(det.infer_jit(variables, pts, np.int32(n)))
        out[f"points_{i}"] = pts
        out[f"num_{i}"] = np.int32(n)
        out[f"boxes_{i}"] = np.asarray(d.boxes, np.float32)
        out[f"scores_{i}"] = np.asarray(d.scores, np.float32)
        out[f"valid_{i}"] = np.asarray(d.valid, bool)
        print(f"frame {i}: {int(out[f'valid_{i}'].sum())} detections")

    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    build()
