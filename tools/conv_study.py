"""Isolated conv microbenchmark on the TPU (profiler-timed).

Wall-clock timing of pure-XLA programs is FICTION on the axon relay
(block_until_ready doesn't force execution); per-op device time from
jax.profiler.trace is real. Each variant runs `--reps` times inside one
trace; we report total TPU device time / reps and achieved TF/s.

Variants cover the RPN's hot conv shapes and candidate reformulations.
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def device_ms(fn, args_list, reps):
    """Total TPU device time of fn over reps calls (cycling inputs), in ms."""
    import jax

    out = fn(*args_list[0])
    jax.block_until_ready(out)
    trace_dir = tempfile.mkdtemp(prefix="convstudy-")
    jax.profiler.start_trace(trace_dir)
    for i in range(reps):
        out = fn(*args_list[i % len(args_list)])
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
    total = 0
    for e in events:
        if (
            e.get("ph") == "X"
            and "TPU" in pids.get(e["pid"], "")
            and not e["name"].startswith("jit_")
        ):
            total += e.get("dur", 0)
    return total / reps / 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    r = np.random.RandomState(0)
    results = []

    def run(name, gflop, fn, mk_args, n_inputs=4):
        fn = jax.jit(fn)
        inputs = [mk_args(i) for i in range(n_inputs)]
        ms = device_ms(fn, inputs, args.reps)
        tfs = gflop / ms  # GF / ms == TF/s
        results.append((name, ms, tfs))
        print(f"{name:44s} {ms:8.3f} ms   {tfs:6.1f} TF/s", flush=True)

    def conv(x, w, stride=1, pad="SAME_TORCH"):
        if pad == "SAME_TORCH":
            p = ((1, 0), (1, 0)) if stride == 2 else ((1, 1), (1, 1))
        else:
            p = pad
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), p, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def mk(shape, dtype=jnp.bfloat16):
        return lambda i: None  # placeholder

    bf = jnp.bfloat16

    # -- 1. the four production conv shapes as-is ---------------------------
    shapes = [
        ("entry 800x800x64 s2 -> 400x400x64", (1, 800, 800, 64), (3, 3, 64, 64), 2, 11.8),
        ("b0 res 400x400x64 s1", (1, 400, 400, 64), (3, 3, 64, 64), 1, 11.8),
        ("b1 res 200x200x128 s1", (1, 200, 200, 128), (3, 3, 128, 128), 1, 11.8),
        ("b2 res 100x100x256 s1", (1, 100, 100, 256), (3, 3, 256, 256), 1, 11.8),
    ]
    for name, xs, ws, st, gf in shapes:
        w = jnp.asarray(r.randn(*ws), bf) * 0.05
        run(
            name, gf,
            lambda x, w=w, st=st: conv(x, w, st),
            lambda i, xs=xs: (jnp.asarray(r.randn(*xs), bf),),
        )

    # -- 2. batched: all 3 block0 res convs at once via batch dim -----------
    w = jnp.asarray(r.randn(3, 3, 64, 64), bf) * 0.05
    run(
        "b0 res, batch=4 (4x GF)", 4 * 11.8,
        lambda x: conv(x, w),
        lambda i: (jnp.asarray(r.randn(4, 400, 400, 64), bf),),
        n_inputs=2,
    )

    # -- 3. wide-channel reformulations of the b0 res conv ------------------
    # 3a. W-packed proxy: view the 64ch map as (400, 200, 128) (w-parity
    #     folded into channels); the exact packed kernel is (3,2,128,128)
    #     with half the taps zero — measure the dense version as an upper
    #     bound on its cost (2x the math of the original conv).
    wp = jnp.asarray(r.randn(3, 2, 128, 128), bf) * 0.05
    run(
        "b0-as-packed proxy (400,200,128) k(3,2) (2x GF)", 23.6,
        lambda x: jax.lax.conv_general_dilated(
            x, wp, (1, 1), ((1, 1), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        ),
        lambda i: (jnp.asarray(r.randn(1, 400, 200, 128), bf),),
    )

    # 3b. s2d entry conv: (400,400,256) k(2,2,256,64) stride 1 (1.78x GF)
    ws2d = jnp.asarray(r.randn(2, 2, 256, 64), bf) * 0.05
    run(
        "entry-s2d (400,400,256) k(2,2,256,64) (21 GF)", 21.0,
        lambda x: jax.lax.conv_general_dilated(
            x, ws2d, (1, 1), ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        ),
        lambda i: (jnp.asarray(r.randn(1, 400, 400, 256), bf),),
    )

    # -- 4. f32 control for b0 (is bf16 even engaged?) -----------------------
    w = jnp.asarray(r.randn(3, 3, 64, 64), jnp.float32) * 0.05
    run(
        "b0 res f32 control", 11.8,
        lambda x: conv(x, w),
        lambda i: (jnp.asarray(r.randn(1, 400, 400, 64), jnp.float32),),
    )

    # -- 5. pure matmuls at equivalent shapes (MXU ceiling check) ------------
    for name, m, k, n in [
        ("matmul M160k K576 N64 (b0-im2col)", 160000, 576, 64),
        ("matmul M160k K576 N128", 160000, 576, 128),
        ("matmul M40k K1152 N128 (b1-im2col)", 40000, 1152, 128),
        ("matmul M10k K2304 N256 (b2-im2col)", 10000, 2304, 256),
        ("matmul M16k K4096 N4096 (big square)", 16384, 4096, 4096),
    ]:
        gf = 2 * m * k * n / 1e9
        wmat = jnp.asarray(r.randn(k, n), bf) * 0.02
        run(
            name, gf,
            lambda a, wmat=wmat: jnp.dot(a, wmat, preferred_element_type=jnp.float32).astype(bf),
            lambda i, m=m, k=k: (jnp.asarray(r.randn(m, k), bf),),
            n_inputs=2,
        )

    print("\nsummary:")
    for name, ms, tfs in results:
        print(f"  {name:44s} {ms:8.3f} ms   {tfs:6.1f} TF/s")


if __name__ == "__main__":
    main()
