"""Per-stage latency breakdown of the inference pipeline on the current
backend (run on TPU). Each stage is jitted separately with device-synced
timing — the fused number will beat the sum, but this shows where time goes.

Usage: python tools/profile_stages.py [--config configs/ntusl_20cm.json]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import synthetic_cloud
from det3d_tpu.config import load_config
from det3d_tpu.pipeline import Detector
from det3d_tpu.utils.timing import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ntusl_20cm.json")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    cfg = load_config(args.config, max_points=120_000)
    det = Detector(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))

    pts = jax.device_put(synthetic_cloud(cfg.max_points, 100_000))
    n = jax.device_put(np.int32(100_000))

    # stage jits
    pre = jax.jit(det.preprocess)
    frame, mask = jax.block_until_ready(pre(pts, n))

    model_apply = jax.jit(
        lambda v, vox, npts, coors: det.model.apply(v, vox, npts, coors, train=False)
    )
    preds = jax.block_until_ready(
        model_apply(variables, frame.voxels[None], frame.num_points_per_voxel[None], frame.coors[None])
    )
    preds1 = {k: v[0] for k, v in preds.items()}

    post = jax.jit(det.postprocess)
    jax.block_until_ready(post(preds1, mask))

    # sub-model stages
    from det3d_tpu.models.pointpillars import PFN, RPN, SharedHead, scatter_to_bev

    dtype = jnp.dtype(cfg.compute_dtype)
    pfn_mod = PFN(voxel_size=tuple(cfg.voxel_size), offset=tuple(cfg.detection_offset), compute_dtype=dtype)
    pfn_vars = {"params": variables["params"]["pfn"], "batch_stats": variables["batch_stats"]["pfn"]}
    pfn_fn = jax.jit(lambda v, a, b, c: pfn_mod.apply(v, a, b, c, False))
    pfeat = jax.block_until_ready(
        pfn_fn(pfn_vars, frame.voxels[None], frame.num_points_per_voxel[None], frame.coors[None])
    )

    scat_fn = jax.jit(lambda f, c: scatter_to_bev(f, c, (cfg.grid_size[0], cfg.grid_size[1])))
    canvas = jax.block_until_ready(scat_fn(pfeat, frame.coors[None]))

    rpn_mod = RPN(compute_dtype=dtype)
    rpn_vars = {"params": variables["params"]["rpn"]}
    rpn_fn = jax.jit(lambda v, x: rpn_mod.apply(v, x))
    rpn_out = jax.block_until_ready(rpn_fn(rpn_vars, canvas))

    head_mod = SharedHead(num_anchor_per_loc=cfg.num_anchors_per_loc, box_code_size=cfg.box_code_size, compute_dtype=dtype)
    head_vars = {"params": variables["params"]["head"]}
    head_fn = jax.jit(lambda v, x: head_mod.apply(v, x))
    jax.block_until_ready(head_fn(head_vars, rpn_out))

    rows = [
        ("preprocess (voxelize+mask)", time_fn(pre, pts, n, iters=args.iters)),
        ("model (pfn+scatter+rpn+head)", time_fn(model_apply, variables, frame.voxels[None], frame.num_points_per_voxel[None], frame.coors[None], iters=args.iters)),
        ("  pfn", time_fn(pfn_fn, pfn_vars, frame.voxels[None], frame.num_points_per_voxel[None], frame.coors[None], iters=args.iters)),
        ("  scatter", time_fn(scat_fn, pfeat, frame.coors[None], iters=args.iters)),
        ("  rpn", time_fn(rpn_fn, rpn_vars, canvas, iters=args.iters)),
        ("  head", time_fn(head_fn, head_vars, rpn_out, iters=args.iters)),
        ("postprocess (decode+nms)", time_fn(post, preds1, mask, iters=args.iters)),
        ("FUSED e2e", time_fn(det.infer_jit, variables, pts, n, iters=args.iters)),
    ]
    for name, t in rows:
        print(f"{name:32s} p50={t['p50_ms']:8.2f}ms best={t['best_ms']:8.2f}ms")


if __name__ == "__main__":
    main()
