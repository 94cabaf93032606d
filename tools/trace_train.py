"""Device-level profiling of the training step with per-source attribution.

Same methodology as trace_pipeline.py (jax.profiler trace + compiled-HLO
source mapping — the only trustworthy fine-grained timing on the relay).

Usage: python tools/trace_train.py [--config configs/ntusl_20cm.json]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ntusl_20cm.json")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from det3d_tpu.config import load_config
    from det3d_tpu.data.synthetic import sample_scene
    from det3d_tpu.train.trainer import Trainer, host_batch

    cfg = load_config(args.config, max_points=120_000, batch_size=args.batch)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batches = [
        jax.device_put(host_batch(cfg, [sample_scene(cfg, rng) for _ in range(args.batch)]))
        for _ in range(args.steps)
    ]

    hlo = (
        jax.jit(trainer.train_step, donate_argnums=(0,))
        .lower(state, batches[0])
        .compile()
        .as_text()
    )
    src = {}
    for m in re.finditer(r"%([\w.\-]+) = .*?source_file=\"([^\"]+)\" source_line=(\d+)", hlo):
        src[m.group(1)] = f"{m.group(2).split('/')[-1]}:{m.group(3)}"

    state, loss, counts = trainer.train_step_jit(state, batches[0])
    jax.block_until_ready(loss)
    trace_dir = tempfile.mkdtemp(prefix="det3d-train-trace-")
    jax.profiler.start_trace(trace_dir)
    for b in batches:
        state, loss, counts = trainer.train_step_jit(state, b)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()

    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        t = json.load(f)
    events = t["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.Counter()
    per_op = collections.Counter()
    total = 0
    for e in events:
        if (
            e.get("ph") == "X"
            and "TPU" in pids.get(e["pid"], "")
            and not e["name"].startswith("jit_")
            # step-envelope markers are named by bare step number and span
            # the WHOLE step — counting them doubles the device total
            # (round-4 trace: four '?? N' rows at 12 ms each = 4 × 48 ms
            # step envelopes over 4 steps)
            and not e["name"].isdigit()
        ):
            loc = src.get(e["name"], "?? " + e["name"].split(".")[0])
            agg[loc] += e.get("dur", 0)
            per_op[e["name"]] += e.get("dur", 0)
            total += e.get("dur", 0)
    print(f"device total: {total / args.steps / 1e3:.2f} ms/step")
    for loc, dur in agg.most_common(args.top):
        print(f"{dur / args.steps / 1e3:8.3f} ms  {loc}")
    shape_of = {}
    for m in re.finditer(r"%?([\w.\-]+) = (\S+?)[ (]", hlo):
        shape_of.setdefault(m.group(1), m.group(2))
    print("\n-- top individual ops --")
    for name, dur in per_op.most_common(args.top // 2):
        print(f"{dur / args.steps / 1e3:8.3f} ms  {name[:46]:46s} "
              f"{shape_of.get(name, '?')[:40]:40s} {src.get(name, '?')}")
    print(f"(trace: {path})")


if __name__ == "__main__":
    main()
