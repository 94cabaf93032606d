"""Device-level profiling of the fused pipeline with per-source attribution.

Captures a jax.profiler trace of N inference runs, dumps the optimized HLO,
and prints device time aggregated by source file:line. This is the ONLY
reliable fine-grained timing on the axon relay (see CLAUDE.md: sub-pipeline
wall timers read ~0 because pure-XLA programs evaluate lazily there).

Usage: python tools/trace_pipeline.py [--config configs/ntusl_20cm.json]
"""

import argparse
import collections
import glob
import gzip
import json
import re
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs", "ntusl_20cm.json"))
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    try:  # CLAUDE.md: always use the persistent cache for TPU runs
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import numpy as np

    from bench import synthetic_cloud
    from det3d_tpu.config import load_config
    from det3d_tpu.pipeline import Detector

    cfg = load_config(args.config, max_points=120_000)
    det = Detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0))
    clouds = [
        jax.device_put(synthetic_cloud(cfg.max_points, 100_000, seed=s))
        for s in range(args.frames)
    ]
    n = jax.device_put(np.int32(100_000))

    # source map from the programs the traced path actually runs: on TPU
    # infer_jit is two chained dispatches (candidates | NMS finalize)
    def hlo_of_stages():
        try:
            s1 = jax.jit(det.infer_candidates).lower(v, clouds[0], n)
            cands = jax.eval_shape(det.infer_candidates, v, clouds[0], n)
            s2 = jax.jit(det.postprocess.finalize_stage).lower(cands)
            return [s1.compile().as_text(), s2.compile().as_text()]
        except Exception:
            return [jax.jit(det.infer).lower(v, clouds[0], n).compile().as_text()]

    hlos = hlo_of_stages()
    hlo = "".join(hlos)
    # instruction names repeat ACROSS modules (fusion.1 exists in both
    # stages): keep stage-1's mapping on collision (it is the big program)
    # and flag genuinely ambiguous names instead of silently misattributing
    src = {}
    ambiguous = set()
    for text in hlos:
        for m in re.finditer(
            r"%([\w.\-]+) = .*?source_file=\"([^\"]+)\" source_line=(\d+)", text
        ):
            loc = f"{m.group(2).split('/')[-1]}:{m.group(3)}"
            if m.group(1) in src and src[m.group(1)] != loc:
                ambiguous.add(m.group(1))
            else:
                src.setdefault(m.group(1), loc)
    for name in ambiguous:
        src[name] = src[name] + " (+stage2 name-clash)"

    jax.block_until_ready(det.infer_jit(v, clouds[0], n))
    trace_dir = tempfile.mkdtemp(prefix="det3d-trace-")
    jax.profiler.start_trace(trace_dir)
    for c in clouds:
        out = det.infer_jit(v, c, n)
    jax.block_until_ready(out)
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
    total = 0
    for e in events:
        if (
            e.get("ph") == "X"
            and "TPU" in pids.get(e["pid"], "")
            and not e["name"].startswith("jit_")
            and not e["name"].isdigit()  # step-envelope markers span whole steps
        ):
            loc = src.get(e["name"], "?? " + e["name"].split(".")[0])
            agg[loc] += e.get("dur", 0)
            total += e.get("dur", 0)
    print(f"device total: {total / args.frames / 1e3:.2f} ms/frame")
    for loc, dur in agg.most_common(args.top):
        print(f"{dur / args.frames / 1e3:8.3f} ms  {loc}")
    print(f"(trace: {path})")

    # per-op detail: individual fusions with their output shape from the HLO
    shape_of = {}
    for m in re.finditer(r"%?([\w.\-]+) = (\S+?)[ (]", hlo):
        shape_of.setdefault(m.group(1), m.group(2))
    per_op = collections.Counter()
    for e in events:
        if (
            e.get("ph") == "X"
            and "TPU" in pids.get(e["pid"], "")
            and not e["name"].startswith("jit_")
            and not e["name"].isdigit()  # step-envelope markers span whole steps
        ):
            per_op[e["name"]] += e.get("dur", 0)
    print("\n-- top individual ops --")
    for name, dur in per_op.most_common(args.top):
        loc = src.get(name, "?")
        shp = shape_of.get(name, "?")
        print(f"{dur / args.frames / 1e3:8.3f} ms  {name[:46]:46s} {shp[:38]:38s} {loc}")

    # categorized rollup: where does the time go by op class?
    cats = collections.Counter()
    for name, dur in per_op.items():
        base = name.split(".")[0]
        if "convolution" in base or base.startswith("conv"):
            c = "convs"
        elif "dot" in base or "gemm" in base:
            c = "matmuls"
        elif base in ("copy", "transpose", "reshape", "bitcast", "pad", "slice",
                      "concatenate", "dynamic-slice", "dynamic-update-slice"):
            c = "relayouts/copies"
        elif "reduce" in base or "scan" in base or "cumsum" in base:
            c = "reduces"
        elif "sort" in base:
            c = "sorts"
        elif base.startswith("_") or "pallas" in base or base.endswith("_impl"):
            c = "pallas kernels"
        elif "fusion" in base:
            c = "fusions (mixed)"
        else:
            c = "other"
        cats[c] += dur
    print("\n-- rollup by op class --")
    for c, dur in cats.most_common():
        print(f"{dur / args.frames / 1e3:8.3f} ms  {c}")


if __name__ == "__main__":
    main()
