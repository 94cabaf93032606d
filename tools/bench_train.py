"""Training-step benchmark on the production geometry (TPU).

Measures steady-state device time per optimizer step (batch 2, synthetic
scenes, ntusl_20cm) the same way bench.py measures inference: enqueue a
window of steps, sync once. Round-1 record: ~167 ms/step; the Pallas fused
matcher (kernels/matcher_pallas.py) targets ≤120 ms.

    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/bench_train.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ntusl_20cm.json")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--pack-w", type=int, default=None,
                    help="override cfg.pack_w (packing is weight-side only, "
                    "so the trainer may pick whichever direction is faster)")
    ap.add_argument("--set", action="append", default=[],
                    help="config override key=json for lever A/Bs, e.g. "
                    "--set late_blocked_train=true (repeatable)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from det3d_tpu.config import load_config
    from det3d_tpu.data.synthetic import sample_scene
    from det3d_tpu.train.trainer import Trainer, host_batch

    overrides = {}
    if args.pack_w is not None:
        overrides["pack_w"] = bool(args.pack_w)
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides[k] = json.loads(v)
    cfg = load_config(args.config, max_points=120_000, batch_size=args.batch,
                      **overrides)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    batches = [
        jax.device_put(host_batch(cfg, [sample_scene(cfg, rng) for _ in range(args.batch)]))
        for _ in range(4)
    ]

    t0 = time.perf_counter()
    state, loss_dict, counts = trainer.train_step_jit(state, batches[0])
    jax.block_until_ready(loss_dict)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s  "
          f"loss={ {k: float(v) for k, v in loss_dict.items()} }", file=sys.stderr)

    # pipelined: enqueue all steps (state carries the dependency chain), one sync
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, loss_dict, counts = trainer.train_step_jit(state, batches[i % len(batches)])
    jax.block_until_ready(loss_dict)
    step_ms = (time.perf_counter() - t0) / args.iters * 1000

    loss = {k: round(float(v), 4) for k, v in loss_dict.items()}
    print(json.dumps({
        "metric": "train_step_time",
        "value": round(step_ms, 2),
        "unit": "ms",
        "extra": {"batch": args.batch, "config": os.path.basename(args.config),
                  "loss": loss},
    }))


if __name__ == "__main__":
    main()
