"""Attribute fused-pipeline time by timing nested prefixes of ONE jitted
function per measurement (per-executable timing floors on the axon tunnel
make separate stage jits unusable). Differences between consecutive rows
give per-stage device cost.

Usage: python tools/profile_prefix.py
"""

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
    cfg = load_config("configs/ntusl_20cm.json", max_points=120_000)
    det = Detector(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    pts = jax.device_put(synthetic_cloud(cfg.max_points, 100_000))
    n = jax.device_put(np.int32(100_000))

    def upto_pre(v, p, m):
        frame, mask = det.preprocess(p, m)
        return frame.voxels.sum() + mask.sum()  # tiny sink

    def upto_model(v, p, m):
        frame, mask = det.preprocess(p, m)
        preds = det.model.apply(
            v, frame.voxels[None], frame.num_points_per_voxel[None], frame.coors[None], train=False
        )
        return sum(x.sum() for x in preds.values()) + mask.sum()

    def upto_topk(v, p, m):
        """Through score masking + top-k + gather, skipping decode/NMS."""
        frame, mask = det.preprocess(p, m)
        preds = det.model.apply(
            v, frame.voxels[None], frame.num_points_per_voxel[None], frame.coors[None], train=False
        )
        preds1 = {k: x[0] for k, x in preds.items()}
        cls_all = preds1["cls_preds"].reshape(-1, 1)
        box_all = preds1["box_preds"].reshape(-1, cfg.box_code_size)
        mask_all = mask.reshape(-1)
        acc = 0.0
        for s in cfg.class_specs:
            a, b = det.anchor_set.class_ranges[s.name]
            scores = jax.nn.sigmoid(jnp.max(cls_all[a:b].astype(jnp.float32), -1))
            gate = mask_all[a:b] & (scores >= 0.05)
            ms = jnp.where(gate, scores, -1.0)
            k = min(1000, b - a)
            top, idx = jax.lax.top_k(ms, k)
            acc = acc + top.sum() + box_all[a:b][idx].sum()
        return acc

    def full(v, p, m):
        out = det.infer(v, p, m)
        return out.boxes.sum() + out.scores.sum()

    rows = []
    for name, fn in [
        ("preprocess only", upto_pre),
        ("+ model", upto_model),
        ("+ topk/gather", upto_topk),
        ("full (+decode/nms)", full),
    ]:
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(variables, pts, n))
        t = time_fn(jfn, variables, pts, n, iters=15)
        rows.append((name, t))
        print(f"{name:22s} p50={t['p50_ms']:8.2f}ms best={t['best_ms']:8.2f}ms")


if __name__ == "__main__":
    main()
