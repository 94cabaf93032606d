"""Serving-envelope sweep: max drop-free replay rate on this rig (VERDICT r4 #5).

Replays a recorded drive (pre-rendered synthetic .bin clouds through the
C++ async loader — the same transport as `cli serve --replay`) at a ladder
of rates and records, per Hz: frames submitted/served/dropped and the
latency percentiles. The summary states the maximum drop-free Hz measured
on this rig and the projected production rate from the pipelined device
time (the dev tunnel adds a fixed ~30 ms dispatch RTT per synced frame that
a production TPU host does not pay — BASELINE.md measurement notes).

Queue model: the consumer serves one frame per synced-dispatch interval
S ≈ RTT + device_ms. A producer at rate f > 1/S displaces stale frames at
~f − 1/S per second by design (bounded queue(2), drop-stale policy —
reference ros_node.py:44-50 behavior with the drop on the other side).

Usage (TPU): python tools/serve_sweep.py [--hz 5,10,15,20,30] [--frames 100]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ntusl_20cm.json")
    ap.add_argument("--hz", default="5,10,15,20,30")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--clouds", type=int, default=16)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from det3d_tpu.apps.serve_app import serve_replay
    from det3d_tpu.config import load_config
    from det3d_tpu.data.synthetic import synthetic_cloud

    cfg = load_config(args.config, max_points=120_000)
    replay_dir = tempfile.mkdtemp(prefix="serve-sweep-")
    for s in range(args.clouds):
        cloud = synthetic_cloud(cfg.max_points, 100_000, seed=s)[:100_000]
        cloud.astype(np.float32).tofile(os.path.join(replay_dir, f"{s:04d}.bin"))

    rows = []
    for hz in [float(h) for h in args.hz.split(",")]:
        print(f"\n=== {hz:g} Hz ===", flush=True)
        lat = serve_replay(cfg, replay_dir, hz=hz, frames=args.frames, loop=True)
        ms = np.asarray(lat) * 1e3
        rows.append(
            {
                "hz": hz,
                "submitted": lat.submitted,
                "served": len(lat),
                "dropped": lat.dropped,
                "p50_ms": round(float(np.percentile(ms, 50)), 1) if len(ms) else None,
                "p95_ms": round(float(np.percentile(ms, 95)), 1) if len(ms) else None,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    drop_free = [r["hz"] for r in rows if r["dropped"] == 0]
    print("\n=== sweep summary ===")
    for r in rows:
        print(json.dumps(r))
    print(
        json.dumps(
            {
                "max_drop_free_hz_on_rig": max(drop_free) if drop_free else 0,
                "note": "rig pays ~30 ms tunnel RTT per synced dispatch; "
                "production ceiling = 1000/pipelined_ms (see bench.py)",
            }
        )
    )


if __name__ == "__main__":
    main()
