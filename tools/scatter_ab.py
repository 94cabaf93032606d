"""A/B microbenchmark for the s2d canvas-scatter kernel variants (TPU).

Wall-clock timing is trustworthy here because the measured program contains
a Pallas custom call, which the axon relay executes eagerly under
`block_until_ready` (pure-XLA programs evaluate lazily there — CLAUDE.md).
Distinct input buffers are cycled so the relay cannot dedupe repeats.

    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/scatter_ab.py \
        [--grid 1600] [--pillars 20000] [--chunk 8]

Prints per-variant (w_major on/off) best-of-3 window averages for the
forward scatter at the given geometry, with a radially-concentrated pillar
distribution like the bench clouds.

NOTE on absolute numbers: results are synced every `--chunk` outstanding
outputs (at the 1600 grid each canvas is ~330 MB bf16 and 32 outstanding
OOMed the 16 GB chip, 2026-08-19), so every window carries iters/chunk
relay round-trips (~30 ms each on the axon tunnel ≈ 3-4 ms/iter at the
defaults). The overhead is constant across variants, so A/B deltas are
preserved, but values are NOT comparable across different --chunk settings
or to fully-pipelined runs. This is how round 3's subtile-kernel A/B was
read (and the kernel correctly rejected — BASELINE.md).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def radial_cells(r: np.random.RandomState, n: int, grid: int, spread_m: float = 25.0):
    """Occupied-cell sample matching bench.synthetic_cloud's radial density."""
    m_per_cell = 160.0 / grid
    dist = np.abs(r.randn(4 * n)) * spread_m + 2.0
    theta = r.uniform(-np.pi, np.pi, 4 * n)
    x = np.clip(((dist * np.cos(theta)) + 80.0) / m_per_cell, 0, grid - 1).astype(np.int64)
    y = np.clip(((dist * np.sin(theta)) + 80.0) / m_per_cell, 0, grid - 1).astype(np.int64)
    cells = np.unique(x * grid + y)
    r.shuffle(cells)
    return cells[:n]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=1600)
    ap.add_argument("--pillars", type=int, default=20000)
    ap.add_argument("--cap", type=int, default=20000, help="max_voxels row count")
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=8,
                    help="sync every N outstanding outputs (VMEM/HBM bound; "
                    "each sync is ~1 relay RTT included in the window)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    print("backend:", jax.default_backend())
    n_syncs = -(-args.iters // args.chunk)
    print(f"chunked sync: {args.chunk} outstanding, {n_syncs} syncs/window "
          f"(~{n_syncs * 30 / args.iters:.1f} ms/iter relay overhead included)")

    from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_s2d_pallas

    g, v, c, b = args.grid, args.cap, args.channels, args.batch
    n_inputs = 6
    inputs = []
    for s in range(n_inputs):
        rs = np.random.RandomState(s)
        feats = rs.randn(b, v, c).astype(np.float32)
        coors = np.full((b, v, 3), -1, np.int32)
        for bi in range(b):
            cells = radial_cells(rs, args.pillars, g)
            npil = len(cells)
            coors[bi, :npil, 0] = cells // g
            coors[bi, :npil, 1] = cells % g
            coors[bi, :npil, 2] = 0
        inputs.append(
            (
                jax.device_put(jnp.asarray(feats, jnp.bfloat16)),
                jax.device_put(jnp.asarray(coors)),
            )
        )

    ref = None
    for w_major in (False, True) if b == 1 else (False,):
        fn = jax.jit(
            lambda f, cr, wm=w_major: scatter_to_bev_s2d_pallas(
                f, cr, (g, g), False, wm
            )
        )
        out = fn(*inputs[0])
        jax.block_until_ready(out)
        got = np.asarray(out, np.float32)
        if ref is None:
            ref = got
        else:
            np.testing.assert_array_equal(got, ref)  # all variants agree
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            pending = []
            for i in range(args.iters):
                pending.append(fn(*inputs[i % n_inputs]))
                if len(pending) == args.chunk:
                    jax.block_until_ready(pending)
                    pending.clear()
            if pending:
                jax.block_until_ready(pending)
                pending.clear()
            windows.append((time.perf_counter() - t0) / args.iters * 1000)
        print(
            f"w_major={int(w_major)}  "
            f"best {min(windows):7.3f} ms  windows "
            + " ".join(f"{w:.3f}" for w in windows)
        )


if __name__ == "__main__":
    main()
