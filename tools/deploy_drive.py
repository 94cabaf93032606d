"""On-chip proof of the AOT deployment path (VERDICT r4 item 1).

The reference's real serving story is TensorRT engines built offline and
reloaded by a separate process (reference: train.py:273-345 `trt_eval`,
framework/trt_utils.py:42-47 `load_engine`). The rebuild's counterpart is
`deploy/export.py` (jax.export StableHLO artifacts) + `deploy/runtime.py`
(`ExportedDetector`), which until round 5 had only CPU test evidence. This
driver proves the full loop on real TPU hardware, across a process boundary:

  phase `export` (process 1):
    * build the live Detector on the production 20 cm geometry, run it on 8
      distinct synthetic ~100k-point clouds (pipelined window timing like
      bench.py), save the resulting annos;
    * `export_detector` → artifact dir (StableHLO + weights + config).
  phase `run` (FRESH process 2, imports no model code paths beyond runtime):
    * `ExportedDetector(artifact_dir)` reloads the serialized programs,
      runs the same clouds, asserts the annos are identical to process 1's,
      and measures the artifact's own pipelined latency.

Usage (on TPU, JAX_COMPILATION_CACHE_DIR=/root/.jax_cache):
    python tools/deploy_drive.py export --out /tmp/deploy_r5
    python tools/deploy_drive.py run   --out /tmp/deploy_r5
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NUM_CLOUDS = 8
NUM_REAL_POINTS = 100_000
ITERS = 32

SMALL_CFG = {
    # tiny geometry for the CPU smoke run (--small --platform cpu): same
    # code paths, compiles in seconds
    "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
    "center_limit": [-16.0, -16.0, -10.0, 16.0, 16.0, 10.0],
    "voxel_size": [1.0, 1.0, 11.0],
    "max_voxels": 256,
    "max_num_points": 5,
    "max_points": 2048,
    "compute_dtype": "float32",
}


def _clouds(max_points: int):
    from det3d_tpu.data.synthetic import synthetic_cloud

    return [
        synthetic_cloud(max_points, NUM_REAL_POINTS, seed=s) for s in range(NUM_CLOUDS)
    ]


def _pipelined_ms(fn, inputs, iters=ITERS) -> float:
    import jax

    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(inputs[i % len(inputs)]) for i in range(iters)]
        jax.block_until_ready(outs)
        windows.append((time.perf_counter() - t0) / iters * 1000)
    return min(windows)


def _annos_equal(a: dict, b: dict) -> tuple[bool, str]:
    for k in ("name", "location", "dimensions", "rotation_y", "score"):
        x, y = np.asarray(a[k]), np.asarray(b[k])
        if x.shape != y.shape:
            return False, f"{k}: shape {x.shape} vs {y.shape}"
        if x.dtype.kind in "US":
            if not (x == y).all():
                return False, f"{k}: name mismatch"
        elif not np.array_equal(x, y):
            return False, f"{k}: max|Δ|={np.abs(x - y).max():.3e}"
    return True, ""


def phase_export(cfg_path, out: Path) -> None:
    import jax

    from det3d_tpu.config import load_config
    from det3d_tpu.deploy.export import export_detector
    from det3d_tpu.pipeline import Detector

    if isinstance(cfg_path, dict):
        cfg = load_config(cfg_path)
    else:
        cfg = load_config(cfg_path, max_points=120_000)
    det = Detector(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))

    clouds = _clouds(cfg.max_points)
    dev = [jax.device_put(c) for c in clouds]
    n = jax.device_put(np.int32(NUM_REAL_POINTS))
    jax.block_until_ready(det.infer_jit(variables, dev[0], n))  # compile
    live_ms = _pipelined_ms(lambda p: det.infer_jit(variables, p, n), dev)
    live_annos = [det.detect(variables, c[:NUM_REAL_POINTS]) for c in clouds]

    export_detector(cfg, out_dir=out)
    with open(out / "live_annos.pkl", "wb") as f:
        pickle.dump({"annos": live_annos, "live_pipelined_ms": live_ms}, f)
    print(
        json.dumps(
            {
                "phase": "export",
                "live_pipelined_ms": round(live_ms, 3),
                "boxes_per_frame": [len(a["score"]) for a in live_annos],
            }
        )
    )


def phase_run(out: Path) -> None:
    import jax

    from det3d_tpu.deploy.runtime import ExportedDetector

    runner = ExportedDetector(out)
    with open(out / "live_annos.pkl", "rb") as f:
        saved = pickle.load(f)

    clouds = _clouds(runner.cfg.max_points)
    mismatches = []
    for i, c in enumerate(clouds):
        annos = runner.detect(c[:NUM_REAL_POINTS])
        ok, why = _annos_equal(saved["annos"][i], annos)
        if not ok:
            mismatches.append(f"frame {i}: {why}")

    padded = [jax.device_put(c) for c in clouds]
    n = jax.device_put(np.int32(NUM_REAL_POINTS))
    jax.block_until_ready(runner.infer(padded[0], n))  # ensure compiled
    exp_ms = _pipelined_ms(lambda p: runner.infer(p, n), padded)

    print(
        json.dumps(
            {
                "phase": "run",
                "parity": "identical" if not mismatches else "MISMATCH",
                "mismatches": mismatches,
                "exported_pipelined_ms": round(exp_ms, 3),
                "live_pipelined_ms": round(saved["live_pipelined_ms"], 3),
            }
        )
    )
    if mismatches:
        raise SystemExit(1)


def main() -> None:
    global NUM_REAL_POINTS, ITERS
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["export", "run"])
    ap.add_argument("--config", default="configs/ntusl_20cm.json")
    ap.add_argument("--out", default="/tmp/deploy_r5")
    ap.add_argument("--small", action="store_true", help="tiny-geometry smoke run")
    ap.add_argument("--platform", default=None, help="e.g. cpu (must precede backend init)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    if args.small:
        NUM_REAL_POINTS, ITERS = 2000, 8

    out = Path(args.out)
    if args.phase == "export":
        phase_export(SMALL_CFG if args.small else args.config, out)
    else:
        phase_run(out)


if __name__ == "__main__":
    main()
