"""End-to-end single-chip benchmark: voxelize → network → decode/NMS.

Measures p50 single-frame latency of the fully-fused inference pipeline on
the production `ntusl_20cm.json` geometry (800x800 BEV canvas, 16k pillars,
1.44 M anchors — BASELINE.md workload constants) with a synthetic ~100k-point
LiDAR-like cloud, and prints ONE JSON line.

vs_baseline compares against the BASELINE.md north-star target of 10 ms p50
(the reference publishes no numbers; BASELINE.json `published: {}`), so
vs_baseline = 10ms / measured_p50 — > 1.0 means faster than target.
"""

import json
import time

import numpy as np


def synthetic_cloud(max_points: int, n: int, seed: int = 0) -> np.ndarray:
    """LiDAR-like synthetic frame: range-decayed radial density + ground
    plane + scattered verticals."""
    r = np.random.RandomState(seed)
    pts = np.zeros((max_points, 4), np.float32)
    # radial distances: concentrated near sensor like a spinning lidar
    dist = np.abs(r.randn(n)) * 25.0 + 2.0
    theta = r.uniform(-np.pi, np.pi, n)
    pts[:n, 0] = dist * np.cos(theta)
    pts[:n, 1] = dist * np.sin(theta)
    pts[:n, 2] = np.where(r.rand(n) < 0.7, r.uniform(-2.0, -1.5, n), r.uniform(-1.5, 4.0, n))
    pts[:n, 3] = r.uniform(0, 1, n)
    return pts


def main() -> None:
    import jax

    from det3d_tpu.config import load_config
    from det3d_tpu.pipeline import Detector

    num_real_points = 100_000
    cfg = load_config("configs/ntusl_20cm.json", max_points=120_000)
    det = Detector(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))

    pts = synthetic_cloud(cfg.max_points, num_real_points)
    points = jax.device_put(pts)
    n = jax.device_put(np.int32(num_real_points))

    fn = det.infer_jit
    out = fn(variables, points, n)  # compile
    jax.block_until_ready(out)

    iters = 50
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(variables, points, n)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    p50_ms = float(np.median(times) * 1000)
    fps = 1000.0 / p50_ms
    target_ms = 10.0
    print(
        json.dumps(
            {
                "metric": "e2e_frame_latency_p50",
                "value": round(p50_ms, 3),
                "unit": "ms",
                "vs_baseline": round(target_ms / p50_ms, 3),
                "extra": {
                    "fps_per_chip": round(fps, 1),
                    "points": num_real_points,
                    "config": "ntusl_20cm",
                    "baseline": "10ms north-star target (reference publishes no numbers)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
