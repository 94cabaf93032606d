"""Why do in-pipeline convs run ~3x slower than standalone?

In-pipeline each conv is fused with the InstanceNorm normalize + relu
prologue and/or residual-add epilogue. This isolates those composites at the
exact production shapes (profiler-timed; wall timing is fiction on the
relay) and also measures the same composite with optimization_barrier
between the elementwise stages and the conv — if the barriered version is
faster, XLA's conv+elementwise fusion is the regression and the model should
barrier its convs.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from conv_study import device_ms  # noqa: E402  (same profiler harness)


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
    bf = jnp.bfloat16
    results = []

    def run(name, gflop, fn, mk_args, n_inputs=3):
        fn = jax.jit(fn)
        inputs = [mk_args(i) for i in range(n_inputs)]
        ms = device_ms(fn, inputs, args.reps)
        results.append((name, ms, gflop / ms))
        print(f"{name:56s} {ms:8.3f} ms   {gflop / ms:6.1f} TF/s", flush=True)

    def conv(x, w, strides=(1, 1), pad=((1, 1), (1, 1))):
        return jax.lax.conv_general_dilated(
            x, w, strides, pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def in_relu(x, mean, inv):
        return jax.nn.relu((x - mean) * inv)

    shapes = [
        ("b0pk (400,200,128) k33", (1, 400, 200, 128), (3, 3, 128, 128), 23.6),
        ("b2   (100,100,256) k33", (1, 100, 100, 256), (3, 3, 256, 256), 11.8),
    ]
    for name, xs, ws, gf in shapes:
        w = jnp.asarray(r.randn(*ws), bf) * 0.05
        c = xs[-1]

        def mk(i, xs=xs, c=c):
            return (
                jnp.asarray(r.randn(*xs), bf),
                jnp.asarray(r.randn(1, 1, 1, c), bf) * 0.1,
                jnp.asarray(1 + 0.1 * r.rand(1, 1, 1, c), bf),
            )

        run(f"{name} bare conv", gf,
            lambda x, m, v, w=w: conv(x, w), mk)
        run(f"{name} IN+relu+conv fused", gf,
            lambda x, m, v, w=w: conv(in_relu(x, m, v), w), mk)
        run(f"{name} IN+relu |barrier| conv", gf,
            lambda x, m, v, w=w: conv(
                jax.lax.optimization_barrier(in_relu(x, m, v)), w), mk)
        run(f"{name} IN+relu+conv+residual fused", gf,
            lambda x, m, v, w=w: x + conv(in_relu(x, m, v), w), mk)
        run(f"{name} barriered both sides", gf,
            lambda x, m, v, w=w: x + jax.lax.optimization_barrier(conv(
                jax.lax.optimization_barrier(in_relu(x, m, v)), w)), mk)

    # entry conv composite (canvas → packed): scatter output is a Pallas
    # custom call, so the canvas arrives unfused — bare vs +IN-epilogue
    went = jnp.asarray(r.randn(2, 3, 256, 128), bf) * 0.05
    run("entry (400,400,256)->s(1,2) k(2,3,256,128) bare", 31.5,
        lambda x, m, v: conv(x, went, (1, 2), ((1, 0), (1, 0))),
        lambda i: (
            jnp.asarray(r.randn(1, 400, 400, 256), bf),
            jnp.asarray(r.randn(1, 1, 1, 128), bf),
            jnp.asarray(1 + 0.1 * r.rand(1, 1, 1, 128), bf),
        ), 2)
    run("entry + IN/relu epilogue fused", 31.5,
        lambda x, m, v: in_relu(conv(x, went, (1, 2), ((1, 0), (1, 0))), m, v),
        lambda i: (
            jnp.asarray(r.randn(1, 400, 400, 256), bf),
            jnp.asarray(r.randn(1, 1, 1, 128), bf),
            jnp.asarray(1 + 0.1 * r.rand(1, 1, 1, 128), bf),
        ), 2)

    print("\nsummary:")
    for name, ms, tfs in results:
        print(f"  {name:56s} {ms:8.3f} ms   {tfs:6.1f} TF/s")


if __name__ == "__main__":
    main()


def chain_study(reps=16):
    """Chained res-stack: does graph context reproduce the in-pipeline 3x?"""
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    r = np.random.RandomState(0)
    bf = jnp.bfloat16
    w1 = jnp.asarray(r.randn(3, 3, 128, 128), bf) * 0.05
    w2 = jnp.asarray(r.randn(3, 3, 128, 128), bf) * 0.05
    w3 = jnp.asarray(r.randn(3, 3, 128, 128), bf) * 0.05

    def in_norm(x):
        xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        m = jnp.mean(xf, 0)
        v = jnp.maximum(jnp.mean(xf * xf, 0) - m * m, 0.0)
        inv = jax.lax.rsqrt(v + 1e-3).astype(x.dtype)
        return (x - m.astype(x.dtype)) * inv

    def in_norm_pallas(x):
        from det3d_tpu.kernels.moments_pallas import column_moments
        n = x.shape[1] * x.shape[2]
        s1, s2 = column_moments(x[0].reshape(n, x.shape[-1]))
        m = s1 / n
        v = jnp.maximum(s2 / n - m * m, 0.0)
        inv = jax.lax.rsqrt(v + 1e-3).astype(x.dtype)
        return (x - m.astype(x.dtype)) * inv

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def stack(norm):
        def f(x):
            h = x
            for w in (w1, w2, w3):
                h = h + conv(jax.nn.relu(norm(h)), w)
            return h
        return f

    variants = [("xla-IN", in_norm)]
    try:  # the Pallas moments kernel was removed after this study proved it
        # a pessimization (git history: kernels/moments_pallas.py); keep the
        # comparison runnable on older checkouts
        import det3d_tpu.kernels.moments_pallas  # noqa: F401
        variants.append(("pallas-IN", in_norm_pallas))
    except ImportError:
        pass
    for name, norm in variants:
        fn = jax.jit(stack(norm))
        inputs = [(jnp.asarray(r.randn(1, 400, 200, 128), bf),) for _ in range(3)]
        ms = device_ms(fn, inputs, reps)
        print(f"3x chained IN+relu+conv+res ({name}): {ms:.3f} ms total, "
              f"{ms / 3:.3f} ms/conv, {23.6 * 3 / ms:.1f} TF/s", flush=True)


if __name__ == "__main__" and os.environ.get("CHAIN"):
    chain_study()


def stats_study(reps=24):
    """Unfused IN-stat alternatives at the entry shape (80000, 128) bf16:
    the naive convert+column-reduce measured ~19 GB/s in-pipeline."""
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    r = np.random.RandomState(0)
    bf = jnp.bfloat16
    n, c = 80000, 128
    ones_bf = jnp.asarray(np.ones((1, n)), bf)
    ones_f = jnp.asarray(np.ones((1, n)), jnp.float32)

    def reduce_naive(x):
        xf = x.astype(jnp.float32)
        return jnp.sum(xf, 0), jnp.sum(xf * xf, 0)

    def dot_bf(x):
        s1 = jax.lax.dot_general(ones_bf, x, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(ones_bf, x * x, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return s1[0], s2[0]

    def dot_f32(x):
        xf = x.astype(jnp.float32)
        s1 = ones_f @ xf
        s2 = ones_f @ (xf * xf)
        return s1[0], s2[0]

    def two_stage(x):
        xf = x.reshape(625, 128, c).astype(jnp.float32)
        p1 = jnp.sum(xf, 1)
        p2 = jnp.sum(xf * xf, 1)
        return jnp.sum(p1, 0), jnp.sum(p2, 0)

    def transpose_rowsum(x):
        xt = x.T.astype(jnp.float32)          # (c, n): lane-dim reduce
        return jnp.sum(xt, 1), jnp.sum(xt * xt, 1)

    for name, fn in [("convert+col-reduce (naive)", reduce_naive),
                     ("ones-dot bf16", dot_bf),
                     ("ones-dot f32", dot_f32),
                     ("two-stage (625,128,c)", two_stage),
                     ("transpose+row-reduce", transpose_rowsum)]:
        j = jax.jit(fn)
        inputs = [(jnp.asarray(r.randn(n, c), bf),) for _ in range(3)]
        ms = device_ms(j, inputs, reps)
        gbs = (n * c * 2) / ms / 1e6
        print(f"{name:32s} {ms:8.3f} ms  {gbs:7.1f} GB/s", flush=True)


def conv_stats_study(reps=24):
    """Reproduce the in-pipeline entry-IN slowness: conv output feeding the
    IN stats + normalize in one program, with candidate fixes."""
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    r = np.random.RandomState(0)
    bf = jnp.bfloat16
    w = jnp.asarray(r.randn(2, 3, 256, 128), bf) * 0.05
    n_, c = 80000, 128
    ones_f = jnp.asarray(np.ones((1, n_)), jnp.float32)

    def entry(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 2), ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def norm(y, s1, s2):
        m = s1 / n_
        v = jnp.maximum(s2 / n_ - m * m, 0.0)
        inv = jax.lax.rsqrt(v + 1e-3).astype(y.dtype)
        return jax.nn.relu((y - m.astype(y.dtype)) * inv)

    def naive(x):
        y = entry(x)
        yf = y.reshape(-1, c).astype(jnp.float32)
        return norm(y, jnp.sum(yf, 0), jnp.sum(yf * yf, 0))

    def dot_stats(x):
        y = entry(x)
        y2 = y.reshape(-1, c)
        yf = y2.astype(jnp.float32)
        s1 = (ones_f @ yf)[0]
        s2 = (ones_f @ (yf * yf))[0]
        return norm(y, s1, s2)

    def barrier_copy(x):
        y = entry(x)
        y2 = jax.lax.optimization_barrier(y.reshape(-1, c))
        yf = y2.astype(jnp.float32)
        return norm(y, jnp.sum(yf, 0), jnp.sum(yf * yf, 0))

    def stats_of_copy(x):
        # force a standard-layout copy first, reduce the copy, normalize it
        y = entry(x)
        y2 = jax.lax.optimization_barrier(y.reshape(-1, c) * jnp.bfloat16(1.0))
        yf = y2.astype(jnp.float32)
        out = norm(y2.reshape(y.shape), jnp.sum(yf, 0), jnp.sum(yf * yf, 0))
        return out

    for name, fn in [("conv+naive-stats+norm", naive),
                     ("conv+ones-dot-stats+norm", dot_stats),
                     ("conv+barrier-reshape-stats+norm", barrier_copy),
                     ("conv+copy;stats-of-copy+norm", stats_of_copy)]:
        j = jax.jit(fn)
        inputs = [(jnp.asarray(r.randn(1, 400, 400, 256), bf),) for _ in range(2)]
        ms = device_ms(j, inputs, reps)
        print(f"{name:36s} {ms:8.3f} ms", flush=True)
