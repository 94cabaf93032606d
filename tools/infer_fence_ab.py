"""A/B: inference stage-1 with vs without the space-to-batch fence.

At batch-1/800x800 (20cm) the s2b conv transform is a ~3x win and the
two-stage dispatch exists to protect it. At 10cm the spatial dims are 4x
larger (1600^2 canvas) — convs may have enough parallelism without s2b,
while the transform's relayout copies (pad+copy of the 1600^2 canvas into
s2b form, ~3 ms in the round-3 trace) are pure overhead. One measurement
answers it: fence cls_preds (kernels/fence_pallas.py) exactly as the
trainer does and compare pipelined frame times.

    nohup python tools/infer_fence_ab.py --config configs/ntusl_10cm.json \
        > /tmp/fence_ab_10cm.log 2>&1 &
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(fn, clouds, n, iters):
    import jax

    jax.block_until_ready(fn(clouds[0], n))
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(clouds[i % len(clouds)], n) for i in range(iters)]
        jax.block_until_ready(outs)
        windows.append((time.perf_counter() - t0) / iters * 1000)
    return windows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ntusl_10cm.json")
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import synthetic_cloud
    from det3d_tpu.config import load_config
    from det3d_tpu.kernels.fence_pallas import s2b_fence
    from det3d_tpu.pipeline import Detector

    cfg = load_config(args.config, max_points=120_000)
    det = Detector(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))

    clouds = [
        jax.device_put(synthetic_cloud(cfg.max_points, 100_000, seed=s))
        for s in range(8)
    ]
    n = jax.device_put(np.int32(100_000))

    # `variables` is a jit ARGUMENT (like infer_jit's), not a closure capture:
    # baked-in weights become compile-time constants, giving XLA different
    # folding/layout freedom than the baseline program and polluting the A/B
    def cand_fenced(variables, points, num_points):
        frame, anchors_mask = det.preprocess(points, num_points)
        preds = det.model.apply(
            variables,
            frame.voxels[None],
            frame.num_points_per_voxel[None],
            frame.coors[None],
            train=False,
        )
        cp = preds["cls_preds"]
        if isinstance(cp, tuple):  # split-head parity pair
            cp = tuple(s2b_fence(c) for c in cp)
        else:
            cp = s2b_fence(cp)
        preds = dict(preds, cls_preds=cp)
        preds = jax.tree.map(lambda v: v[0], preds)
        return det.postprocess.decode_stage(preds, anchors_mask)

    stage1f = jax.jit(cand_fenced)
    stage2 = jax.jit(det.postprocess.finalize_stage)

    def fenced(points, num_points):
        return stage2(stage1f(variables, points, num_points))

    def baseline(points, num_points):
        return det.infer_jit(variables, points, num_points)

    print("== baseline (s2b active) ==", flush=True)
    wb = measure(baseline, clouds, n, args.iters)
    print("baseline windows:", [round(w, 3) for w in wb], flush=True)

    print("== fenced (s2b disabled) ==", flush=True)
    t0 = time.perf_counter()
    wf = measure(fenced, clouds, n, args.iters)
    print(f"(first call incl compile: {time.perf_counter() - t0:.1f}s)", flush=True)
    print("fenced windows:", [round(w, 3) for w in wf], flush=True)

    print(
        f"RESULT baseline={min(wb):.3f} ms  fenced={min(wf):.3f} ms  "
        f"delta={min(wb) - min(wf):+.3f} ms"
    )


if __name__ == "__main__":
    main()
