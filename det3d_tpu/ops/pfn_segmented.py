"""Segmented PFN: pillar features straight from the sorted point array.

TPU-native inference path that replaces the dense ``(V, P, C)`` voxel
buffers + PFN module (reference: networks/pointpillars8_shared.py:11-60)
with per-segment reductions over the cell-sorted point array the voxelizer
already builds. Two observations collapse the whole PFN:

1. **The decoration is linear.** With the point feature row ``p = (x, y, z,
   r)``, cluster mean ``m`` and pillar center ``c``, the decorated feature
   is ``f = (p, p_xyz - m, p_xy - c)``, so for the (inference-frozen,
   foldable) BatchNorm affine ``y = (f @ W) * alpha + beta``:

       y_i = p_i @ Wp + t_s,   t_s = beta - m_s @ Wm - c_s @ Wc

   splits into a per-POINT term (a tiny ``(n, C) @ (C, F)`` matmul on the
   sorted array) and a per-PILLAR 64-vector.

2. **ReLU is monotone**, so the pillar max commutes with the per-pillar
   shift: ``max_i relu(y_i) = relu(max_i (p_i @ Wp) + t_s)``. The only
   segment-shaped reduction left is a segmented MAX of ``u = p @ Wp``.

The remaining segmented max + xyz sums run in ONE Pallas kernel over the
sorted array (kernels/pfn_pallas.pfn_window_tables): windowed suffix
max/sum by doubling passes entirely in VMEM. A pure-XLA sparse-table RMQ
formulation of the same reduction was measured 0.4-0.6 ms SLOWER than the
dense path end-to-end (BASELINE.md round-4 close) — its ``log2(P)``
shifted-max levels materialize ~4n·F of HBM table traffic that the kernel
never emits. The caller-side cost is two V-row head gathers instead of
the dense path's V·P-row window gather.

Nothing here materializes per-(pillar, slot) buffers: the dense path's
``(V, P, C)`` window gather (latency-bound scattered rows), the ``(V, P,
C+5)`` decoration fusion and the ``(V, P, F)`` dense output round-trip all
disappear. Inference-only: training keeps the dense PFN (it needs live
batch statistics, and these folds assume frozen BN).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from det3d_tpu.ops.voxelize import VoxelizerSpec, fcfs_segments


class PFNFold(NamedTuple):
    """Frozen-BN PFN parameters folded for the segmented formulation."""

    wp: jax.Array    # (C, F) per-point weights (decoration identities folded in)
    wm: jax.Array    # (3, F) cluster-mean weights
    wc: jax.Array    # (2, F) pillar-center weights
    beta: jax.Array  # (F,) BN shift; relu(beta) is the padding-slot max floor


def fold_pfn_params(
    kernel: jax.Array,   # (C+5, F) pfn_dense kernel
    scale: jax.Array,
    bias: jax.Array,
    ra_mean: jax.Array,
    ra_var: jax.Array,
    *,
    num_point_features: int = 4,
    epsilon: float = 1e-5,
) -> PFNFold:
    """Fold the frozen BatchNorm affine into the dense kernel and split it
    by decoration source (see module docstring)."""
    alpha = scale * jax.lax.rsqrt(ra_var + epsilon)          # (F,)
    wk = kernel.astype(jnp.float32) * alpha[None, :]
    c = num_point_features
    wm = wk[c : c + 3]
    wc = wk[c + 3 : c + 5]
    wp = wk[:c].at[:3].add(wm).at[:2].add(wc)
    beta = bias - ra_mean * alpha
    return PFNFold(wp, wm, wc, beta)


def fold_from_variables(
    variables: Any, *, num_point_features: int = 4, epsilon: float = 1e-5
) -> PFNFold:
    """Extract + fold the PFN parameters from a PointPillars variable tree."""
    p = variables["params"]["pfn"]
    bs = variables["batch_stats"]["pfn"]["pfn_bn"]
    return fold_pfn_params(
        p["pfn_dense"]["kernel"],
        p["pfn_bn"]["scale"],
        p["pfn_bn"]["bias"],
        bs["mean"],
        bs["var"],
        num_point_features=num_point_features,
        epsilon=epsilon,
    )


def pillar_features_segmented(
    points: jax.Array,       # (max_points, C) f32, rows beyond num_points pad
    num_points: jax.Array,   # () int32
    spec: VoxelizerSpec,
    fold: PFNFold,
    *,
    compute_dtype: Any = jnp.bfloat16,
    interpret: bool | None = None,
):
    """Points → (pillar_features (V, F), coors, counts, voxel_num).

    Matches ``PFN(voxelize(points))`` with frozen batch statistics up to
    floating-point reassociation (exact decoration/max/mean/floor semantics,
    including the reference's first-P-points cap and the relu(BN(0)) padding
    floor — pointpillars8_shared.py:45-60)."""
    from det3d_tpu.kernels.pfn_pallas import pfn_window_tables

    n, _ = points.shape
    cd = jnp.dtype(compute_dtype)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    seg = fcfs_segments(points, num_points, spec, row_windows=True)
    cnt = seg.counts
    h = seg.headpos

    # windowed suffix tables over the sorted array, all-VMEM (doubling
    # passes; kernels/pfn_pallas.py) — m[i] = max(u[i : i+wlen]),
    # s[i, :3] = sum(xyz[i : i+wlen])
    m_tab, s_tab = pfn_window_tables(
        seg.spoints,
        seg.row_wlen,
        fold.wp,
        spec.max_num_points,
        out_dtype=cd,
        interpret=interpret,
    )
    hc = jnp.clip(h, 0, n - 1)
    umax = m_tab[hc].astype(jnp.float32)                     # (V, F) head gather
    s_xyz = s_tab[hc][:, :3]                                 # (V, 3) head gather
    mean = s_xyz / jnp.maximum(cnt, 1).astype(jnp.float32)[:, None]

    # per-pillar shift t_s = beta - m @ Wm - c @ Wc
    vx, vy = spec.voxel_size[0], spec.voxel_size[1]
    center = jnp.stack(
        [
            seg.coors[:, 0].astype(jnp.float32) * vx + (vx / 2 + spec.offset[0]),
            seg.coors[:, 1].astype(jnp.float32) * vy + (vy / 2 + spec.offset[1]),
        ],
        axis=1,
    )                                                        # (V, 2)
    tvec = fold.beta[None, :] - mean @ fold.wm - center @ fold.wc

    y = jax.nn.relu(umax + tvec)
    # non-full pillars max against the padding-slot constant relu(beta)
    floor = jax.nn.relu(fold.beta)[None, :].astype(y.dtype)
    y = jnp.where((cnt < spec.max_num_points)[:, None], jnp.maximum(y, floor), y)
    live = (cnt > 0) & seg.valid_slot
    feats = jnp.where(live[:, None], y, 0.0).astype(cd)
    return feats, seg.coors, cnt, seg.voxel_num
