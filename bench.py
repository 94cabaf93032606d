"""End-to-end single-chip benchmark: voxelize → network → decode/NMS.

Measures the fully-fused inference pipeline on the production
`ntusl_20cm.json` geometry (800x800 BEV canvas, 16k pillars, 1.44 M anchors —
BASELINE.md workload constants) with synthetic ~100k-point LiDAR-like clouds,
and prints ONE JSON line.

Methodology notes:
  * distinct clouds are cycled so no layer can cache/dedupe repeat calls;
  * p50 latency is per-call with a device sync each frame (includes host
    dispatch — on a tunneled dev chip that adds a fixed RTT the real host
    wouldn't pay);
  * throughput is measured pipelined (enqueue all frames, sync once), which
    hides dispatch latency exactly as a production serving loop would.

vs_baseline compares against the BASELINE.md north-star target of 10 ms
per frame (the reference publishes no numbers; BASELINE.json
`published: {}`), so vs_baseline = 10ms / pipelined_ms_per_frame — > 1.0
means faster than target. The headline is the PIPELINED time, not the
synced p50: the p50 additionally pays the dev tunnel's fixed ~30 ms
dispatch RTT that a production TPU host doesn't have (it is still reported
in extra.latency_p50_synced_ms).
"""

import json
import time

import numpy as np


from det3d_tpu.data.synthetic import synthetic_cloud  # shared with `cli tune`


def measure(config_path: str, iters: int, batch: int = 1) -> dict:
    """Measure one geometry; returns {p50_ms, thru_ms, windows}.

    `batch > 1`: vmapped two-stage batched inference (the production
    throughput mode — make_sharded_infer on however many devices divide
    the batch; 1 on this rig), timed per FRAME with `iters` frames/window."""
    import jax

    from det3d_tpu.config import load_config
    from det3d_tpu.pipeline import Detector

    num_real_points = 100_000
    num_clouds = 8
    cfg = load_config(config_path, max_points=120_000)
    det = Detector(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))

    if batch > 1:
        import math

        from det3d_tpu.parallel.mesh import make_mesh, make_sharded_infer

        mesh = make_mesh(math.gcd(batch, len(jax.devices())))
        infer_b = make_sharded_infer(det, mesh)
        host = [
            synthetic_cloud(cfg.max_points, num_real_points, seed=s)
            for s in range(num_clouds * batch)
        ]
        batches = [
            jax.device_put(np.stack(host[i * batch : (i + 1) * batch]))
            for i in range(num_clouds)
        ]
        cnt = jax.device_put(np.full((batch,), num_real_points, np.int32))
        fnb = lambda P: infer_b(variables, P, cnt)  # noqa: E731
        jax.block_until_ready(fnb(batches[0]))  # compile
        chunks = max(iters // batch, 4)
        times = []
        for i in range(chunks):
            t0 = time.perf_counter()
            jax.block_until_ready(fnb(batches[i % num_clouds]))
            times.append((time.perf_counter() - t0) / batch)
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fnb(batches[i % num_clouds]) for i in range(chunks)]
            jax.block_until_ready(outs)
            windows.append((time.perf_counter() - t0) / (chunks * batch) * 1000)
        return {
            "p50_ms": float(np.median(times) * 1000),
            "thru_ms": min(windows),
            "windows": [round(w, 3) for w in windows],
            "points": num_real_points,
        }

    clouds = [
        jax.device_put(synthetic_cloud(cfg.max_points, num_real_points, seed=s))
        for s in range(num_clouds)
    ]
    n = jax.device_put(np.int32(num_real_points))

    fn = det.infer_jit
    jax.block_until_ready(fn(variables, clouds[0], n))  # compile

    # per-call latency, synced every frame, distinct inputs
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(variables, clouds[i % num_clouds], n)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    p50_ms = float(np.median(times) * 1000)

    # pipelined throughput: enqueue everything, one sync. The dev relay has
    # occasional multi-ms interference spikes (other tenants / tunnel
    # hiccups), so measure several windows and report the best — the
    # windows are long enough (~50 frames) that the best one is still a
    # steady-state average, not a lucky single frame.
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(variables, clouds[i % num_clouds], n) for i in range(iters)]
        jax.block_until_ready(outs)
        windows.append((time.perf_counter() - t0) / iters * 1000)
    return {
        "p50_ms": p50_ms,
        "thru_ms": min(windows),
        "windows": [round(w, 3) for w in windows],
        "points": num_real_points,
    }


def _wait_for_backend(max_wait_s: float) -> None:
    """Retry backend init until the device shows up (or the budget runs out).

    The axon TPU tunnel has observed multi-minute outages ("TPU backend
    setup/compile error (Unavailable)"); a transient outage at launch should
    delay the benchmark, not kill it. Probes run in SUBPROCESSES because a
    failed in-process init can leave the backend registry poisoned."""
    import subprocess
    import sys

    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=300,
            )
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False  # init hanging counts as down
        if ok:
            return
        if time.monotonic() >= deadline:
            sys.stderr.write(
                "bench.py: backend still unavailable after "
                f"{max_wait_s:.0f}s; proceeding (will fail with the real error)\n"
            )
            return
        sys.stderr.write("bench.py: backend unavailable, retrying in 60s\n")
        time.sleep(60)


def main() -> None:
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ntusl_20cm.json")
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--batch", type=int, default=1,
                    help="batched-throughput mode: vmapped two-stage "
                    "inference, per-frame numbers (production serving)")
    ap.add_argument(
        "--skip-10cm", action="store_true",
        help="measure only --config (default runs also record ntusl_10cm "
        "in extra so the second production geometry stays driver-visible)",
    )
    args = ap.parse_args()

    # persistent compile cache: the remote AOT helper takes ~10 min cold on
    # the full pipeline; cached compiles load in seconds
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    _wait_for_backend(max_wait_s=1800.0)
    primary = measure(args.config, args.iters, batch=args.batch)
    thru_ms = primary["thru_ms"]
    target_ms = 10.0

    extra = {
        "pipelined_windows_ms": primary["windows"],
        "latency_p50_synced_ms": round(primary["p50_ms"], 3),
        "fps_per_chip_pipelined": round(1000.0 / thru_ms, 1),
        "points": primary["points"],
        "config": args.config.split("/")[-1].rsplit(".", 1)[0],
        "baseline": "10ms north-star target (reference publishes no numbers)",
    }
    if args.batch > 1:
        extra["batch"] = args.batch
    if args.batch == 1 and not args.skip_10cm and "ntusl_20cm" in args.config:
        import os

        # resolve next to this script (a CWD-relative path would die AFTER
        # the 20cm measurement when bench.py runs from another directory)
        ten_cfg = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "configs", "ntusl_10cm.json"
        )
        ten = measure(ten_cfg, max(args.iters // 2, 8))
        extra["ntusl_10cm"] = {
            "e2e_frame_time_pipelined_ms": round(ten["thru_ms"], 3),
            "pipelined_windows_ms": ten["windows"],
            "latency_p50_synced_ms": round(ten["p50_ms"], 3),
        }

    print(
        json.dumps(
            {
                # pipelined per-frame time is the device's real cost; the
                # synced p50 additionally pays a fixed ~30ms dispatch RTT of
                # the axon dev tunnel that a production TPU host doesn't have
                "metric": "e2e_frame_time_pipelined",
                "value": round(thru_ms, 3),
                "unit": "ms",
                "vs_baseline": round(target_ms / thru_ms, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
