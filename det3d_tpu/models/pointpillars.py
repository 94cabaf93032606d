"""PointPillars in Flax, designed NHWC/TPU-first.

Architecture parity with the reference's trainable variant (reference:
networks/pointpillars8_shared.py):

  * PFN — 9-feature point decoration (xyz+intensity, cluster-mean offset,
    pillar-center offset), masked, 1x1 conv(9→64)+BN+ReLU, max-pool over the
    pillar's points (reference :11-60). The 1x1 Conv1d becomes a Dense matmul
    on the MXU.
  * Scatter — pillar features → dense BEV canvas, an XLA scatter by pillar
    coords instead of the reference's per-sample python loop / inline CUDA
    kernel (reference :63-111 and networks/pointpillars8_trt.py:139-205).
  * RPN — 3 strided blocks (depths 2/4/4, widths 64/128/256) of
    full-pre-activation residual units with InstanceNorm, plus 3 transposed-
    conv upsample heads (widths 64/128/128) concatenated to 320 channels at
    the 400x400 scale (reference :114-181, :418-431).
  * SharedHead — one fused transposed matmul → channel-major cls/box/dir
    over the anchor-major flat ordering a*(fx*fy)+(x*fy+y) that matches
    anchors.py and the reference (:299-343) — see SharedHead for the
    zero-relayout formulation.

Differences, by design (TPU-first, not a translation):
  * NHWC layout everywhere (TPU conv-native) instead of NCHW.
  * Fixed `max_voxels` pillar buffers with an explicit validity mask instead
    of dynamic slicing; empty pillar slots are masked out of the PFN output
    and their coords (-1) drop out of the scatter.
  * PFN batch-norm statistics are computed over *valid point slots only*
    (the reference's BatchNorm1d averaged the zeroed padding slots too);
    running stats live in the standard `batch_stats` collection.
  * Convs/matmuls run in a configurable compute dtype (default bfloat16)
    with float32 parameters and float32 normalization statistics.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from det3d_tpu.config import Config

# torch Conv2d(k=3, stride=2, padding=1) on even inputs uses effective
# padding (lo=1, hi=0); reproduce that alignment explicitly.
_PAD_S2 = ((1, 0), (1, 0))
_PAD_S1 = ((1, 1), (1, 1))


class MaskedBatchNorm(nn.Module):
    """BatchNorm over channel features where only `mask`-ed rows contribute
    to the batch statistics. Running stats use torch's convention
    (momentum = fraction of the *new* batch statistic)."""

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array,
        train: bool,
        axis_name: str | None = None,
    ) -> jax.Array:
        # x: (..., C); mask: broadcastable to x[..., 0]. `axis_name`: sync-BN
        # — inside a shard_map data-parallel step the masked sums/counts
        # psum across devices, so the statistics are exactly the full
        # global-batch values (torch-on-one-GPU semantics), not per-shard.
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if train:
            m = mask.astype(jnp.float32)[..., None]
            xf = x.astype(jnp.float32) * m
            red = tuple(range(x.ndim - 1))
            count = jnp.sum(m)
            sum_x = jnp.sum(xf, axis=red)
            if axis_name is not None:
                count = jax.lax.psum(count, axis_name)
                sum_x = jax.lax.psum(sum_x, axis_name)
            denom = jnp.maximum(count, 1.0)
            mean = sum_x / denom
            sum_sq = jnp.sum(m * (x.astype(jnp.float32) - mean) ** 2, axis=red)
            if axis_name is not None:
                sum_sq = jax.lax.psum(sum_sq, axis_name)
            var = sum_sq / denom
            if not self.is_initializing():
                # torch BatchNorm1d stores the UNBIASED (Bessel-corrected)
                # batch variance in running_var while normalizing with the
                # biased one — reproduce both so trained batch_stats match a
                # torch-trained reference (test_batch_stats_update_matches_torch)
                var_unbiased = sum_sq / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var_unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class PFN(nn.Module):
    """Pillar Feature Net: decorate → 1x1 conv (MXU matmul) → BN → ReLU →
    max over points. Reference: networks/pointpillars8_shared.py:11-60."""

    voxel_size: tuple[float, float, float]
    offset: tuple[float, float, float]
    out_channels: int = 64
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        voxels: jax.Array,        # (B, V, P, C)
        num_points: jax.Array,    # (B, V) int32
        coors: jax.Array,         # (B, V, 3) int32 (-1 for empty slots)
        train: bool = False,
        axis_name: str | None = None,  # sync-BN axis (shard_map DP step)
    ) -> jax.Array:               # (B, V, out_channels)
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_offset = vx / 2 + self.offset[0]
        y_offset = vy / 2 + self.offset[1]

        p = voxels.shape[-2]
        counts = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None, None]

        # cluster-mean offsets (3): distance to the pillar's point centroid
        points_mean = jnp.sum(voxels[..., :3], axis=-2, keepdims=True) / counts
        f_cluster = voxels[..., :3] - points_mean

        # pillar-center offsets (2): distance to the pillar's cell center
        cx = coors[..., 0:1].astype(voxels.dtype) * vx + x_offset
        cy = coors[..., 1:2].astype(voxels.dtype) * vy + y_offset
        f_center = jnp.stack(
            [voxels[..., 0] - cx, voxels[..., 1] - cy], axis=-1
        )

        features = jnp.concatenate([voxels, f_cluster, f_center], axis=-1)

        # zero decorated features on padding slots (reference :45-54)
        slot = jnp.arange(p, dtype=jnp.int32)
        mask = slot[None, None, :] < num_points[..., None]  # (B, V, P)
        features = features * mask[..., None].astype(features.dtype)

        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.compute_dtype, name="pfn_dense")(
            features.astype(self.compute_dtype)
        )
        x = MaskedBatchNorm(name="pfn_bn")(x, mask, train, axis_name)
        x = nn.relu(x)
        # max over ALL of the pillar's point slots, padding included — exactly
        # the reference semantics (pointpillars8_shared.py:57-60): a padding
        # slot's features are zero pre-matmul, so post-BN it carries the
        # per-channel constant relu(BN(0)), which acts as a floor of the max
        # in every non-full pillar. (An earlier -inf-masked max here was a
        # real functional divergence, caught by the weights-transplant test.)
        x = jnp.max(x, axis=-2)
        # empty pillar slots (the padded V dimension the reference never
        # sees) are zeroed: their coords (-1) drop out of the scatter anyway
        valid = (num_points > 0)[..., None]
        return jnp.where(valid, x, 0.0).astype(self.compute_dtype)


def scatter_to_bev(
    pillar_features: jax.Array,  # (B, V, C)
    coors: jax.Array,            # (B, V, 3) int32, -1 rows dropped
    grid_xy: tuple[int, int],
) -> jax.Array:                  # (B, nx, ny, C)
    """Scatter pillar features onto the dense BEV canvas (NHWC).

    XLA scatter with unique indices replaces the reference's python loop over
    the batch / inline-CUDA kernel (networks/pointpillars8_shared.py:63-111,
    networks/pointpillars8_trt.py:176-193)."""
    nx, ny = grid_xy
    b, v, c = pillar_features.shape
    canvas = jnp.zeros((b, nx, ny, c), pillar_features.dtype)

    def scatter_one(cv, feats, crs):
        # -1 rows → positive OOB ("drop" mode doesn't drop negatives)
        cx = jnp.where(crs[:, 0] >= 0, crs[:, 0], nx)
        return cv.at[cx, crs[:, 1], :].set(feats, mode="drop", unique_indices=True)

    return jax.vmap(scatter_one)(canvas, pillar_features, coors)


def scatter_to_bev_s2d(
    pillar_features: jax.Array,  # (B, V, C)
    coors: jax.Array,            # (B, V, 3) int32, -1 rows dropped
    grid_xy: tuple[int, int],
) -> jax.Array:                  # (B, nx/2, ny/2, 4C)
    """Scatter pillars directly into the space-to-depth canvas layout
    consumed by the packed entry conv (PackedConv kind='entry', the
    w-parity packed block0): cell (x, y) → z[x//2, y//2, phase block],
    phase = (x%2)*2 + y%2. Same scatter cost as the dense canvas, but the
    4C channel dim fills the full 128-lane tile from the first conv on."""
    nx, ny = grid_xy
    assert nx % 2 == 0 and ny % 2 == 0
    b, v, c = pillar_features.shape
    canvas = jnp.zeros((b, nx // 2, ny // 2, 4, c), pillar_features.dtype)

    def scatter_one(cv, feats, crs):
        valid = crs[:, 0] >= 0
        cx = jnp.where(valid, crs[:, 0] // 2, nx)  # OOB row → dropped
        cy = crs[:, 1] // 2
        phase = (crs[:, 0] % 2) * 2 + (crs[:, 1] % 2)
        return cv.at[cx, cy, phase, :].set(feats, mode="drop", unique_indices=True)

    out = jax.vmap(scatter_one)(canvas, pillar_features, coors)
    return out.reshape(b, nx // 2, ny // 2, 4 * c)


def _moments_from_sums(s1: jax.Array, s2: jax.Array, hw: int, packed: bool):
    """(B, C) f32 sums → per-(sample, channel) mean and rsqrt(var+eps),
    with the packed-parity merge on the tiny (B, C) tensors."""
    if packed:
        c2 = s1.shape[-1] // 2
        s1 = s1[:, :c2] + s1[:, c2:]
        s2 = s2[:, :c2] + s2[:, c2:]
        n = jnp.array(hw * 2, jnp.float32)
    else:
        n = jnp.array(hw, jnp.float32)
    mean = s1 / n                                     # (b, c) or (b, c/2)
    m2 = s2 / n
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + 1e-3)
    if packed:
        mean = jnp.concatenate([mean, mean], axis=-1)
        inv = jnp.concatenate([inv, inv], axis=-1)
    return mean, inv, n


def _in_moments(x: jax.Array, packed: bool):
    """Per-(sample, channel) mean and rsqrt(var+eps), f32, (B, C) each.

    Plain XLA sums ON PURPOSE, on BOTH paths (see _instance_norm/_in_fwd):
    inference fuses them into conv epilogues or cheap multi-output reduce
    fusions; training measured SLOWER with Pallas streaming-stat kernels.

    Reduces the 4D map over (1, 2) directly — NO reshape to (b, h·w, c):
    under space-to-batch conv layouts that reshape is layout-incompatible
    and XLA materializes an 85 MB f32 copy per IN layer.

    REJECTED (round 3, measured): computing both sums via ONE augmented-Gram
    MXU dot (pad a constant-1 channel; border row = Σx, diagonal = Σx²) to
    attack the ~2.5 ms of standalone 10 cm IN-stat reduce fusions. The
    dot_general contracting (1, 2) forces every block/residual map OUT of
    its space-to-batch conv layout first — a full-map relayout copy per IN
    site: 20 cm 6.94 → 8.79, 10 cm 25.4 → 31.4 ms/frame. The branch INs'
    `_gram_moments` survives because it contracts the COARSE pre-deconv map
    (not an s2b conv operand) and kills a real reduction barrier."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))
    s2 = jnp.sum(xf * xf, axis=(1, 2))
    return _moments_from_sums(s1, s2, h * w, packed)


def _reduce_cc(a: jax.Array, packed: bool, n) -> jax.Array:
    """Per-(sample, channel) mean of a map, with the packed parity merge.
    4D reduce, no (b, h·w, c) reshape — see _in_moments."""
    b, h, w, c = a.shape
    s = jnp.sum(a.astype(jnp.float32), axis=(1, 2))
    if packed:
        c2 = c // 2
        s = s[:, :c2] + s[:, c2:]
        s = jnp.concatenate([s, s], axis=-1)
    return s / n


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _instance_norm(x: jax.Array, name: str, packed: bool = False) -> jax.Array:
    """InstanceNorm2d, affine=False, eps=1e-3 — matches the RPN's norm layer
    (reference networks/pointpillars8_shared.py:128). Stateless (no params).

    Statistics accumulate in f32 (reduction dtype) without materializing an
    f32 copy of the activation map; the normalize pass runs in the input
    dtype. Single-pass variance (E[x²]−E[x]²) is safe at these activation
    magnitudes with the reference's large eps=1e-3.

    `packed=True`: x is a w-parity-packed map (H, W/2, 2C) whose channel j
    and j+C are the SAME logical channel at even/odd columns — the two
    half-blocks' statistics merge so the result is bit-comparable to the
    unpacked InstanceNorm over (H, W, C).

    TPU note: the stats are plain XLA sums ON PURPOSE. XLA multi-output-
    fuses them into the PRODUCING conv's epilogue, so they cost ~nothing; a
    Pallas moments kernel here (tried in round 2) forces the activation map
    through HBM again and breaks that fusion — the surrounding convs dropped
    from ~100 to ~34 TF/s (tools/conv_fusion_study.py chain_study). The
    round-1 "column reduce is 10x off bandwidth" measurement that motivated
    the kernel was an UNFUSED reduce over a half-lane C=64 map — both
    conditions the packed layout has since removed.

    Training note: custom VJP with the textbook analytic IN gradient
      dx = r·(g − mean(g) − x̂·mean(g·x̂)),  x̂ = (x−μ)·r
    — two reductions and one elementwise pass over cotangents, instead of
    autodiff's longer saved-residual chains (~13 ms of the b=2 train step
    was IN stats + their transposes; tools/trace_train.py). The var<0 clamp
    edge (impossible up to fp error) is ignored by the analytic form."""
    mean, inv, _ = _in_moments(x, packed)
    inv_c = inv[:, None, None].astype(x.dtype)
    return (x - mean[:, None, None].astype(x.dtype)) * inv_c


def _in_fwd(x, name, packed):
    # Plain XLA sums here too — MEASURED (round 3, post-s2b-fence): swapping
    # in Pallas streaming-stat kernels made the step SLOWER (48.7 → 54.5
    # ms/step with fwd+bwd kernels, 52.4 with fwd-only): the "slow" column
    # reduces are in fact multi-output-fused with neighboring passes, and a
    # custom call un-fuses them into extra full-map HBM reads.
    mean, inv, n = _in_moments(x, packed)
    inv_c = inv[:, None, None].astype(x.dtype)
    y = (x - mean[:, None, None].astype(x.dtype)) * inv_c
    return y, (x, mean, inv, n)


def _in_bwd(name, packed, res, g):
    x, mean, inv, n = res
    inv_c = inv[:, None, None].astype(x.dtype)
    xhat = (x - mean[:, None, None].astype(x.dtype)) * inv_c
    m_g = _reduce_cc(g, packed, n)                     # (b, c) f32
    m_gx = _reduce_cc(g * xhat, packed, n)
    dx = inv_c * (
        g
        - m_g[:, None, None].astype(g.dtype)
        - xhat * m_gx[:, None, None].astype(g.dtype)
    )
    return (dx.astype(x.dtype),)


_instance_norm.defvjp(_in_fwd, _in_bwd)


def _gram_moments(x: jax.Array, kf: jax.Array, n_out: int):
    """IN statistics of `pixel_shuffle(x @ kf)` computed WITHOUT the fine
    map: per logical output channel o (kf columns grouped [phase][o]),
      s1_o = Σ_ph (Σ_hw x) · kf[:, ph, o]
      s2_o = Σ_ph kf[:, ph, o]ᵀ (Σ_hw x xᵀ) kf[:, ph, o]
    The Gram matrix Σ x xᵀ is a tiny (C, C) MXU matmul over the COARSE
    input, so the statistics no longer depend on the materialized deconv
    output — the reduction barrier between the deconv matmul and the
    normalize pass disappears and XLA fuses normalize+relu into the
    pixel-shuffle copy (measured: the separate multiply-maximum passes over
    the fine branch maps vanish from the trace).

    x: (B, H, W, C); kf: f32 (C, P, O) with P phases; n_out = fine element
    count per channel. Returns (mean, inv) f32 (B, O) exactly as
    `_in_moments` computes on the fine map (up to f32 association)."""
    xf = x.astype(jnp.float32)
    sx = jnp.sum(xf, axis=(1, 2))                         # (B, C)
    gram = jnp.einsum("bhwc,bhwd->bcd", xf, xf)           # (B, C, C)
    s1 = jnp.einsum("bc,cpo->bo", sx, kf)
    gk = jnp.einsum("bcd,dpo->bcpo", gram, kf)
    s2 = jnp.einsum("cpo,bcpo->bo", kf, gk)
    n = jnp.array(n_out, jnp.float32)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    return mean, jax.lax.rsqrt(var + 1e-3)


class DeconvUpsample(nn.Module):
    """ConvTranspose(k=S, stride=S, VALID) as a 1x1 matmul + depth-to-space.

    With kernel == stride the transposed conv has no overlapping taps, so it
    factors exactly into `x @ W.reshape(C, S·S·O)` followed by a
    pixel-shuffle — one big MXU matmul instead of XLA's dilated-conv
    lowering (~2x faster here). Parameter-compatible with nn.ConvTranspose:
    the kernel keeps its (S, S, C, O) shape and layout.

    `fuse_in_relu=True` (inference) additionally applies the branch's
    InstanceNorm + ReLU inline, with the statistics computed from the
    input's Gram matrix (`_gram_moments`) instead of the materialized fine
    map — IN is stateless (affine=False) so this adds no parameters and the
    epilogue is pure elementwise, fusing into the matmul/pixel-shuffle."""

    features: int
    stride: int
    compute_dtype: Any = jnp.bfloat16
    packed_out: bool = False  # emit the w-parity packed layout (H·s, W·s/2, 2O)
    fuse_in_relu: bool = False
    split_parity: bool = False  # emit ((H·s, W·s/2, O) per col parity) instead
    #                             of one packed tensor — see RPN neck concat

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s, o = self.stride, self.features
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=2, out_axis=3),
            (s, s, c, o),
            jnp.float32,
        )
        # lax.conv_transpose applies the spatially-flipped kernel; flip here
        # so parameters are bit-compatible with nn.ConvTranspose checkpoints
        kf = kernel[::-1, ::-1].reshape(s * s, c, o).transpose(1, 0, 2)
        k = kf.astype(self.compute_dtype).reshape(c, s * s * o)
        y = x.astype(self.compute_dtype) @ k                 # (b, h, w, s*s*o)
        if self.fuse_in_relu:
            mean, inv = _gram_moments(x, kf, h * w * s * s)
            scale = jnp.tile(inv, (1, s * s)).astype(y.dtype)      # (b, s·s·o)
            shift = jnp.tile(-mean * inv, (1, s * s)).astype(y.dtype)
            y = jnp.maximum(y * scale[:, None, None] + shift[:, None, None], 0)
        y = y.reshape(b, h, w, s, s, o)
        if self.split_parity:
            # inference neck form: one tensor PER column parity, sliced
            # BEFORE the pixel-shuffle transpose so each relayout copy moves
            # half the bytes, and the downstream concat consumes plain
            # operands (no slice-of-transpose chains). Fine col w·s + s_w has
            # parity s_w % 2 and packed col (w·s + s_w)//2 = w·(s//2) + s_w//2,
            # so the kept s_w//2 axis lands minor-adjacent to w — a pure
            # reshape after the row-interleave transpose.
            parts = []
            for p in (0, 1):
                yp = y[:, :, :, :, p::2, :]                  # (b, h, w, s, s/2, o)
                yp = yp.transpose(0, 1, 3, 2, 4, 5)          # (b, h, s, w, s/2, o)
                parts.append(yp.reshape(b, h * s, w * (s // 2), o))
            return tuple(parts)
        y = y.transpose(0, 1, 3, 2, 4, 5)                    # (b, h, s, w, s, o)
        if self.packed_out:
            # (w, s_w, o) regrouped as (w·s/2, (s_w%2)·O + o): the same
            # linear order, so the packed emission is a pure reshape
            return y.reshape(b, h * s, w * (s // 2), 2 * o)
        return y.reshape(b, h * s, w * s, o)


class PreActResidual(nn.Module):
    """Full-pre-activation residual unit: (IN → ReLU → 3x3 conv) x depth,
    plus identity. Reference: networks/pointpillars8_shared.py:418-431
    (`Resnet2`, num_layer+1 convs)."""

    dim: int
    num_convs: int
    compute_dtype: Any = jnp.bfloat16
    packed: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        for i in range(self.num_convs):
            h = _instance_norm(h, f"in{i}", packed=self.packed)
            h = nn.relu(h)
            if self.packed:
                h = PackedConv(
                    self.dim, self.dim, "res", self.compute_dtype, name=f"conv{i}"
                )(h)
            else:
                h = nn.Conv(
                    self.dim, (3, 3), padding=_PAD_S1, use_bias=False,
                    dtype=self.compute_dtype, name=f"conv{i}",
                )(h)
        return x + h


# --- w-parity packed block0 -------------------------------------------------
#
# The RPN's first block runs C=64 at 400²-800² spatial: half-empty MXU lanes
# and lane-padded bf16 maps made it the slowest part of the network (measured
# 8-24 TF/s vs 99-126 for the 128/256-channel blocks — tools/conv_study.py).
# Packing the column parity into channels — map (H, W, C) stored as
# (H, W/2, 2C) with channel p·C+c holding column 2w+p — fills the lanes:
# every block0 conv becomes a 128-channel conv whose kernel is the original
# (3,3,C,O) parameter's taps rearranged with structured zeros (1.3-2x the
# MACs at ~4x the throughput). Parameters keep their reference shapes; the
# packing is pure weight-side construction, so checkpoints and the torch
# weights-transplant stay compatible.
#
# Index algebra (column axis; rows are never packed except at the s2d entry):
#   packed input col  w2+s-Δ, parity pi  ↔ original col 2(w2+s-Δ)+pi
#   packed output col w2,     parity po  ↔ original col 2·w2+po
# A tap of the original 3x3 kernel at offset dj contributes to packed kernel
# position (s, pi·C, po·O) iff dj = 2(s-Δ)+pi-po lands in [-1, 1].


def _pack_entry_kernel(w: jax.Array) -> jax.Array:
    """(3,3,C,O) stride-2 entry kernel → (2,3,4C,2O) on the s2d canvas.

    Input is the 4-phase space-to-depth canvas (H/2, W/2, 4C), channel
    (a·2+b)·C+c = original cell (2h+a, 2w+b); output is the w-parity packed
    block0 map (H/2, W/4, 2O). Row taps: di = 2(r-1)+a; col taps:
    dj = 2(s-1)+b-2p (strides (1,2), padding ((1,0),(1,0)))."""
    c, o = w.shape[2], w.shape[3]
    zeros = jnp.zeros((c, o), w.dtype)

    def tap(di, dj):
        return w[di + 1, dj + 1] if -1 <= di <= 1 and -1 <= dj <= 1 else zeros

    return jnp.stack(
        [
            jnp.stack(
                [
                    jnp.concatenate(
                        [
                            jnp.concatenate(
                                [tap(2 * (r - 1) + a, 2 * (s - 1) + b - 2 * p) for p in (0, 1)],
                                axis=1,
                            )
                            for a in (0, 1)
                            for b in (0, 1)
                        ],
                        axis=0,
                    )
                    for s in (0, 1, 2)
                ],
                axis=0,
            )
            for r in (0, 1)
        ],
        axis=0,
    )


def _pack_res_kernel(w: jax.Array) -> jax.Array:
    """(3,3,C,O) stride-1 kernel → (3,3,2C,2O) packed→packed.
    Col taps: dj = 2(s-1)+pi-po (strides (1,1), padding ((1,1),(1,1)))."""
    c, o = w.shape[2], w.shape[3]
    zeros = jnp.zeros((c, o), w.dtype)

    def tap(r, dj):
        return w[r, dj + 1] if -1 <= dj <= 1 else zeros

    return jnp.stack(
        [
            jnp.stack(
                [
                    jnp.concatenate(
                        [
                            jnp.concatenate(
                                [tap(r, 2 * (s - 1) + pi - po) for po in (0, 1)], axis=1
                            )
                            for pi in (0, 1)
                        ],
                        axis=0,
                    )
                    for s in (0, 1, 2)
                ],
                axis=0,
            )
            for r in (0, 1, 2)
        ],
        axis=0,
    )


def _pack_down_kernel(w: jax.Array) -> jax.Array:
    """(3,3,C,O) stride-2 kernel → (3,2,2C,O), packed input → STANDARD
    output (the next block is ≥128 channels and needs no packing).
    Col taps: dj = 2(s-1)+pi (strides (2,1), padding ((1,0),(1,0)))."""
    c, o = w.shape[2], w.shape[3]
    zeros = jnp.zeros((c, o), w.dtype)

    def tap(r, dj):
        return w[r, dj + 1] if -1 <= dj <= 1 else zeros

    return jnp.stack(
        [
            jnp.stack(
                [
                    jnp.concatenate([tap(r, 2 * (s - 1) + pi) for pi in (0, 1)], axis=0)
                    for s in (0, 1)
                ],
                axis=0,
            )
            for r in (0, 1, 2)
        ],
        axis=0,
    )


class PackedConv(nn.Module):
    """A block0 conv on w-parity packed maps. Holds the reference-shaped
    (3,3,C,O) parameter (checkpoint/transplant compatible with nn.Conv) and
    applies the packed rearrangement at trace time.

    kind: 'entry' (s2d canvas → packed), 'res' (packed → packed),
          'down' (packed → standard)."""

    features: int
    in_channels: int
    kind: str
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_channels, self.features),
            jnp.float32,
        )
        pack, strides, pad = {
            "entry": (_pack_entry_kernel, (1, 2), ((1, 0), (1, 0))),
            "res": (_pack_res_kernel, (1, 1), ((1, 1), (1, 1))),
            "down": (_pack_down_kernel, (2, 1), ((1, 0), (1, 0))),
            # VALID-row variants for the blocked block0 (halo rows supply the
            # taps; same params, same math on the valid region)
            "entry_valid": (_pack_entry_kernel, (1, 2), ((0, 0), (1, 0))),
            "res_valid": (_pack_res_kernel, (1, 1), ((0, 0), (1, 1))),
            "down_valid": (_pack_down_kernel, (2, 1), ((0, 0), (1, 0))),
        }[self.kind]
        return jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            pack(w).astype(self.compute_dtype),
            window_strides=strides,
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class PackedPointwise(nn.Module):
    """1x1 conv on a packed map: block-diagonal (2C, 2O) kernel from the
    reference-shaped (1,1,C,O) parameter (parities never mix in a 1x1).

    `fuse_in_relu=True` applies the branch InstanceNorm + ReLU inline with
    Gram-matrix statistics (see DeconvUpsample): the two parity blocks are
    the "phases" of `_gram_moments`, reproducing the packed stats merge."""

    features: int
    in_channels: int
    compute_dtype: Any = jnp.bfloat16
    fuse_in_relu: bool = False
    split_parity: bool = False  # emit per-parity channel halves (see RPN neck)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_channels, self.features),
            jnp.float32,
        )
        zeros = jnp.zeros_like(w[0, 0])
        k = jnp.concatenate(
            [
                jnp.concatenate([w[0, 0], zeros], axis=1),
                jnp.concatenate([zeros, w[0, 0]], axis=1),
            ],
            axis=0,
        )[None, None]
        y = jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            k.astype(self.compute_dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.fuse_in_relu:
            b, h, w2, _ = x.shape
            # block-diag columns split per parity phase: phase p's column for
            # logical channel o is w in rows [p·C, (p+1)·C), zero elsewhere
            kf = jnp.stack(
                [
                    jnp.concatenate([w[0, 0], zeros], axis=0),
                    jnp.concatenate([zeros, w[0, 0]], axis=0),
                ],
                axis=1,
            )                                              # (2C, 2, O)
            mean, inv = _gram_moments(x, kf, h * w2 * 2)
            scale = jnp.tile(inv, (1, 2)).astype(y.dtype)
            shift = jnp.tile(-mean * inv, (1, 2)).astype(y.dtype)
            y = jnp.maximum(y * scale[:, None, None] + shift[:, None, None], 0)
        if self.split_parity:
            o = self.features
            return y[..., :o], y[..., o:]
        return y


def block0_blocking(grid_xy: tuple[int, int]) -> tuple[int, tuple[int, int]]:
    """(nblk, halo) for the blocked-halo block0 at this geometry, or
    (1, …) when the grid can't block (blocked path disabled then).

    Halo = (4, 3): block0's VALID-row convs consume 1 top row (the 2-tap
    entry) + 1 row per side per residual conv (3 of them at depth 2) — the
    margins retire exactly at the last conv (RPN._blocked_block0 asserts
    depth 2). nblk = the largest of 8/4/2 dividing the canvas rows with at
    least 8 rows per block (sub-halo-size blocks pay more duplicate-halo
    MACs than the s2b copy they remove)."""
    halo = (4, 3)
    nx2 = grid_xy[0] // 2
    nblk = next((n for n in (8, 4, 2) if nx2 % n == 0 and nx2 // n > 7), 1)
    return nblk, halo


def _in_blocked_moments(x5: jax.Array, top: int, valid_rows: int, packed: bool):
    xs = x5[:, :, top : top + valid_rows].astype(jnp.float32)
    s1 = jnp.sum(xs, axis=(1, 2, 3))                       # (B, 2C)
    s2 = jnp.sum(xs * xs, axis=(1, 2, 3))
    n = x5.shape[1] * valid_rows * x5.shape[3]             # = H · W2 unblocked
    return _moments_from_sums(s1, s2, n, packed=packed)


def _in_blocked_apply(x5, mean, inv, top, bot):
    mean_c = mean[:, None, None, None].astype(x5.dtype)
    inv_c = inv[:, None, None, None].astype(x5.dtype)
    y = (x5 - mean_c) * inv_c
    if top:
        y = y.at[:, 0, :top].set(0.0)
    if bot:
        y = y.at[:, -1, y.shape[2] - bot :].set(0.0)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _instance_norm_blocked(
    x5: jax.Array, top: int, bot: int, valid_rows: int, packed: bool = True
) -> jax.Array:
    """InstanceNorm over a blocked-halo packed map (B, nblk, R, W2, 2C):
    statistics from the VALID rows [top, top+valid_rows) of every block —
    each full-map row counted exactly once (halo rows duplicate neighbors)
    — then the WHOLE map (halos included) normalized, so the duplicated
    halo rows stay bit-consistent with their originals.

    Out-of-canvas halo rows (the first block's `top` and the last block's
    `bot` margin rows) are re-zeroed after the normalize: the full-map conv
    zero-pads there, and an IN'd zero is -mean·inv ≠ 0 — without this the
    next conv reads garbage at the canvas edges and its IN's statistics
    drift map-wide (caught by the isolated block0 equality probe).

    Analytic VJP (the blocked analogue of `_instance_norm`'s): with
    ĝ = g after the same edge re-zeroing and x̂ = (x−μ)·r,
      dx = r·(ĝ − 1_valid·(mean_n(ĝ) + x̂·mean_n(ĝ·x̂)))
    where the ĝ-sums run over the WHOLE blocked map (halo rows' cotangents
    flow through μ and r too — every y_i depends on them) but the divisor n
    and the correction's row support are the VALID region only (μ, σ are
    functions of valid rows alone, so only their dx picks up the stats
    terms). Two fused reductions + one elementwise pass, replacing
    autodiff's saved-residual chains (same argument as `_instance_norm`,
    whose analytic form was worth ~13 ms/step in round 2)."""
    mean, inv, _ = _in_blocked_moments(x5, top, valid_rows, packed)
    return _in_blocked_apply(x5, mean, inv, top, bot)


def _in_blocked_fwd(x5, top, bot, valid_rows, packed):
    mean, inv, n = _in_blocked_moments(x5, top, valid_rows, packed)
    return _in_blocked_apply(x5, mean, inv, top, bot), (x5, mean, inv, n)


def _in_blocked_bwd(top, bot, valid_rows, packed, res, g):
    x5, mean, inv, n = res
    if top:
        g = g.at[:, 0, :top].set(0.0)
    if bot:
        g = g.at[:, -1, g.shape[2] - bot :].set(0.0)
    mean_c = mean[:, None, None, None].astype(x5.dtype)
    inv_c = inv[:, None, None, None].astype(x5.dtype)
    xhat = (x5 - mean_c) * inv_c
    # full-map sums (halo cotangents included), VALID-count divisor n
    s_g = jnp.sum(g.astype(jnp.float32), axis=(1, 2, 3))          # (B, C*)
    s_gx = jnp.sum((g * xhat).astype(jnp.float32), axis=(1, 2, 3))
    if packed:
        c2 = s_g.shape[-1] // 2
        s_g = jnp.tile(s_g[:, :c2] + s_g[:, c2:], (1, 2))
        s_gx = jnp.tile(s_gx[:, :c2] + s_gx[:, c2:], (1, 2))
    m_g = (s_g / n)[:, None, None, None].astype(g.dtype)
    m_gx = (s_gx / n)[:, None, None, None].astype(g.dtype)
    # the stats correction lands on valid rows only — express it as a row
    # mask so the whole bwd is one elementwise fusion over the map
    rowmask = (
        jnp.zeros((x5.shape[2], 1, 1), g.dtype)
        .at[top : top + valid_rows]
        .set(1.0)
    )
    dx = inv_c * (g - rowmask * (m_g + xhat * m_gx))
    return (dx.astype(x5.dtype),)


_instance_norm_blocked.defvjp(_in_blocked_fwd, _in_blocked_bwd)


class _BlockedPreActResidual(nn.Module):
    """PreActResidual on a blocked-halo map: VALID-row convs shrink the halo
    by one row per side per conv (no exchange); the identity crops to match.
    Parameter paths are IDENTICAL to PreActResidual (conv{i}/kernel) so
    checkpoints are blocked-path-agnostic."""

    dim: int
    num_convs: int
    valid_rows: int
    top_in: int  # top margin of the input
    compute_dtype: Any = jnp.bfloat16
    packed: bool = True  # w-parity packed map (block0) vs standard (blocks 1-2)

    @nn.compact
    def __call__(self, x5: jax.Array) -> jax.Array:
        bsz, nblk = x5.shape[0], x5.shape[1]
        h = x5
        for i in range(self.num_convs):
            m = self.top_in - i
            h = _instance_norm_blocked(h, m, m, self.valid_rows, self.packed)
            h = nn.relu(h)
            r, w2, c = h.shape[2], h.shape[3], h.shape[4]
            if self.packed:
                h = PackedConv(
                    self.dim, self.dim, "res_valid", self.compute_dtype,
                    name=f"conv{i}",
                )(h.reshape(bsz * nblk, r, w2, c))
            else:
                h = nn.Conv(
                    self.dim, (3, 3), padding=((0, 0), (1, 1)), use_bias=False,
                    dtype=self.compute_dtype, name=f"conv{i}",
                )(h.reshape(bsz * nblk, r, w2, c))
            h = h.reshape(bsz, nblk, r - 2, w2, -1)
        k = self.num_convs
        return x5[:, :, k:-k] + h


def late_blocking(rows_out: int) -> int:
    """nblk for a late-blocked block (1 → dense): largest of 8/4/2 dividing
    the block's OUTPUT rows with at least 32 rows per block — below that the
    10 duplicated halo rows per block (+20% MACs at 50 rows) stop paying for
    the batch-(B·nblk) emitter rate (same economics as block0_blocking)."""
    return next((n for n in (8, 4, 2) if rows_out % n == 0 and rows_out // n >= 32), 1)


def _reblock_rows(x: jax.Array, nblk: int, rb2: int, m: int) -> jax.Array:
    """(B, H, W, C) → (B, nblk, Rin, W, C) halo'd input blocks for a
    stride-2-rows entry conv with 1 top pad row: block i's output rows are
    [i·rb2 − m, (i+1)·rb2 + m) at the downsampled resolution, and output
    row j reads input rows 2j−1 … 2j+1, so the block's input span is
    [2·(i·rb2 − m) − 1, 2·((i+1)·rb2 + m − 1) + 2). Out-of-map rows are
    ZERO — exactly the dense conv's zero padding (the blocked INs re-zero
    the out-of-map margin rows after each normalize, so every later conv
    reads zeros there too). Static slice + pad + stack: the autodiff
    transpose is pad-to-position + sum, which accumulates halo-duplicate
    cotangents into their source rows for free — no gather/scatter."""
    bsz, h, w, c = x.shape
    rin = 2 * (rb2 + 2 * m) + 1
    blocks = []
    for i in range(nblk):
        lo = 2 * (i * rb2 - m) - 1
        hi = lo + rin
        lo_c, hi_c = max(lo, 0), min(hi, h)
        blocks.append(
            jnp.pad(
                x[:, lo_c:hi_c],
                ((0, 0), (lo_c - lo, hi - hi_c), (0, 0), (0, 0)),
            )
        )
    return jnp.stack(blocks, axis=1)


class RPN(nn.Module):
    """Multi-scale 2D backbone + upsample-concat neck.

    Reference: networks/pointpillars8_shared.py:114-181. Output: 320-channel
    map at half input resolution (400x400 for the 800x800 canvas)."""

    compute_dtype: Any = jnp.bfloat16
    layer_nums: tuple[int, ...] = (2, 4, 4)
    num_filters: tuple[int, ...] = (64, 128, 256)
    upsample_strides: tuple[int, ...] = (1, 2, 4)
    num_upsample_filters: tuple[int, ...] = (64, 128, 128)
    pack_w: bool = False  # input is the s2d canvas (B, H/2, W/2, 4C); block0
    #                       and the upsample branches run w-parity packed
    fuse_in_stats: bool = False  # inference: branch IN stats via Gram matrices
    #                       (requires pack_w) — see _gram_moments
    split_out: bool = False  # packed only: return per-column-parity concats
    #                       ((B, H, W/2, 320) x 2) instead of the merged map —
    #                       SharedHead contracts them directly (two dots) and
    #                       the full-map unpack relayout never materializes
    block0_blocked: bool = False  # input is the blocked-halo s2d canvas
    #                       (B, nblk, R, ny2, 4C): run ALL of block0 batch-
    #                       over-blocks with VALID-row convs so XLA's
    #                       space-to-batch pad + full-canvas blocking copy
    #                       never exists (Config.block0_blocked for
    #                       inference, Config.block0_blocked_train for the
    #                       train step)
    late_blocked: bool = False  # training: blocks 1-2 batch-over-blocks too
    #                       (Config.late_blocked_train): each block re-blocks
    #                       its input with fresh 5-row halos (_reblock_rows)
    #                       and runs entry + residual convs VALID-row at
    #                       batch B·nblk — the b=2 dense emitters on these
    #                       convs run at ~60-70 TF/s vs 150+ blocked
    #                       (tools/train_mfu.py, BASELINE.md round-5)

    @property
    def out_channels(self) -> int:
        return sum(self.num_upsample_filters)

    def _blocked_block0(self, x5: jax.Array, width: int) -> jax.Array:
        """ALL of block0 on the blocked-halo canvas (B, nblk, R, ny2, 4C)
        from kernels/scatter_pallas.scatter_to_bev_s2d_blocked, R = rows/blk
        + 4 + 3: VALID-row convs consume one halo row per side per conv
        (entry: top only), IN statistics count the valid rows exactly once,
        residual identities crop to match — every value equals the full-map
        computation (up to f32 stat association), no halo exchange anywhere.
        The margins retire exactly at the last conv; the unblock is a pure
        reshape. Same parameter paths as the unblocked path."""
        bsz, nblk, r0, w2c, c4 = x5.shape
        # entry conv (2 row taps, VALID): consumes 1 TOP halo row
        x = PackedConv(
            width, c4 // 4, "entry_valid", self.compute_dtype, name="block0_down"
        )(x5.reshape(bsz * nblk, r0, w2c, c4))
        x5 = x.reshape(bsz, nblk, r0 - 1, w2c // 2, -1)      # margins (3, 3)
        rb = r0 - 7                                          # valid rows/blk
        x5 = _instance_norm_blocked(x5, 3, 3, rb)
        x5 = nn.relu(x5)
        x5 = _BlockedPreActResidual(
            width, 2, rb, 3, self.compute_dtype, name="block0_res0"
        )(x5)                                                # margins (1, 1)
        x5 = _BlockedPreActResidual(
            width, 1, rb, 1, self.compute_dtype, name="block0_res1"
        )(x5)                                                # margins (0, 0)
        return x5.reshape(bsz, nblk * rb, x5.shape[3], x5.shape[4])

    def _blocked_late(self, x: jax.Array, b: int, width: int, nblk: int) -> jax.Array:
        """Block b ∈ {1, 2} batch-over-blocks (late_blocked): re-block the
        previous block's output with fresh 5-row halos, run the stride-2
        entry conv and the three residual units (depth 4 → convs [2, 2, 1])
        as VALID-row convs at batch B·nblk, margins retiring one row per
        conv exactly as `_blocked_block0` does; the unblock is a pure
        reshape. Same parameter paths as the dense path — checkpoints are
        blocked-path-agnostic; values equal the dense computation up to f32
        stat association (the blocked INs count every valid row once)."""
        rows_out = x.shape[1] // 2
        rb = rows_out // nblk
        m = 5  # 5 residual convs after the entry → 5-row output margins
        xb = _reblock_rows(x, nblk, rb, m)
        bsz = xb.shape[0]
        flat = xb.reshape((bsz * nblk,) + xb.shape[2:])
        if b == 1 and self.pack_w:
            # packed block0 output: 'down' consumes the packed map, emits
            # standard (the W/2 axis already halves width; rows stride 2)
            x = PackedConv(
                width, flat.shape[-1] // 2, "down_valid", self.compute_dtype,
                name="block1_down",
            )(flat)
        else:
            x = nn.Conv(
                width, (3, 3), strides=(2, 2), padding=((0, 0), (1, 0)),
                use_bias=False, dtype=self.compute_dtype, name=f"block{b}_down",
            )(flat)
        x = x.reshape(bsz, nblk, rb + 2 * m, x.shape[2], -1)
        x = _instance_norm_blocked(x, m, m, rb, packed=False)
        x = nn.relu(x)
        for u, (ncv, top) in enumerate(zip((2, 2, 1), (m, m - 2, 1))):
            x = _BlockedPreActResidual(
                width, ncv, rb, top, self.compute_dtype, packed=False,
                name=f"block{b}_res{u}",
            )(x)
        return x.reshape(bsz, nblk * rb, x.shape[3], x.shape[4])

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ups = []
        for b, (depth, width, up_stride, up_width) in enumerate(
            zip(self.layer_nums, self.num_filters, self.upsample_strides, self.num_upsample_filters)
        ):
            packed = self.pack_w and b == 0
            if b == 0 and self.block0_blocked:
                assert self.pack_w and depth == 2, "blocked block0: packed depth-2 only"
                x = self._blocked_block0(x, width)
            elif (
                b >= 1
                and self.late_blocked
                and depth == 4
                and late_blocking(x.shape[1] // 2) > 1
            ):
                x = self._blocked_late(x, b, width, late_blocking(x.shape[1] // 2))
            else:
                if b == 0 and self.pack_w:
                    x = PackedConv(
                        width, x.shape[-1] // 4, "entry", self.compute_dtype,
                        name="block0_down",
                    )(x)
                elif b == 1 and self.pack_w:
                    x = PackedConv(
                        width, x.shape[-1] // 2, "down", self.compute_dtype,
                        name="block1_down",
                    )(x)
                else:
                    x = nn.Conv(
                        width, (3, 3), strides=(2, 2), padding=_PAD_S2, use_bias=False,
                        dtype=self.compute_dtype, name=f"block{b}_down",
                    )(x)
                x = _instance_norm(x, f"block{b}_in", packed=packed)
                x = nn.relu(x)
                # depth 2 → residual units with [2, 1] convs; depth 4 → [2, 2, 1]
                # (reference builds Resnet2(…,1) x (depth//2) then Resnet2(…,0))
                convs_per_unit = [2] * (depth // 2) + [1]
                for u, ncv in enumerate(convs_per_unit):
                    x = PreActResidual(
                        width, ncv, self.compute_dtype, packed=packed,
                        name=f"block{b}_res{u}",
                    )(x)

            u = x
            fuse = self.fuse_in_stats and self.pack_w
            if up_stride > 1:
                u = DeconvUpsample(
                    up_width, up_stride, self.compute_dtype,
                    packed_out=self.pack_w, fuse_in_relu=fuse,
                    split_parity=fuse, name=f"deconv{b}",
                )(u)
            elif self.pack_w:
                u = PackedPointwise(
                    up_width, width, self.compute_dtype, fuse_in_relu=fuse,
                    split_parity=fuse, name=f"deconv{b}",
                )(u)
            else:
                u = nn.Conv(
                    up_width, (1, 1), use_bias=False, dtype=self.compute_dtype,
                    name=f"deconv{b}",
                )(u)
            if fuse:
                ups.append(u)  # IN + ReLU already applied inline (Gram stats)
            else:
                u = _instance_norm(u, f"deconv{b}_in", packed=self.pack_w)
                ups.append(nn.relu(u))
        if self.pack_w:
            if self.fuse_in_stats:
                # inference: branches arrive pre-split per parity (slice
                # BEFORE the pixel-shuffle transpose — half-size relayout
                # copies, plain concat operands)
                n, hh, w2, _ = ups[0][0].shape
                per_p = [[u[p] for u in ups] for p in (0, 1)]
            else:
                n, hh, w2, _ = ups[0].shape
                per_p = [
                    [
                        u[..., p * bw : (p + 1) * bw]
                        for u, bw in zip(ups, self.num_upsample_filters)
                    ]
                    for p in (0, 1)
                ]
            if self.split_out:
                # one (B, H, W/2, 320) concat PER column parity: the head
                # contracts each directly and interleaves its own 90-channel
                # output — the (B, H, W/2, 640) → (B, H, W, 320) unpack
                # relayout of the full neck map (1.4 ms/frame at 10 cm,
                # reshape.535 in the round-3 trace) never exists
                return tuple(jnp.concatenate(ps, axis=-1) for ps in per_p)
            # parity-outer concat + reshape: out[h, 2·w2+p, :] must be the
            # per-original-column 320 channels, so concatenate the branches'
            # parity parts p-major and merge (w2, p) — the concat's data
            # movement performs the unpack; no extra relayout exists
            cat = jnp.concatenate(per_p[0] + per_p[1], axis=-1)
            return cat.reshape(n, hh, w2 * 2, self.out_channels)
        return jnp.concatenate(ups, axis=-1)


class SharedHead(nn.Module):
    """Single head over all classes: one fused 1x1 conv → cls/box/dir in the
    spatial channel-major (N, k, nch, fx, fy) contract over the anchor-major
    order of anchors.build_anchors (reference ordering,
    anchor_assigner.py:284-298; row-major flatten of (nch, fx, fy) recovers
    the reference's flat anchor index).

    Reference: networks/pointpillars8_shared.py:299-343.

    TPU formulation: the three 1x1 convs are one transposed dot_general
    `W' (320, 90) x features (N, H, W, 320) → (90, N, H, W)` whose output
    rows, with the weight columns pre-permuted to [k][anchor] order, ARE the
    channel-major predictions. Because the spatial dims stay MINOR all the
    way into the loss / decode consumers, the group slices and (k, anchor)
    splits below touch only major axes — they are layout-free, where the
    earlier flat (N, k, A) contract forced materialized retiling of every
    million-anchor map (~4 ms/frame at the 10 cm geometry: unaligned
    63/18-row sublane slices + 1D-flat relayouts). Parameters keep
    nn.Dense's {kernel (in, out), bias (out,)} shapes and the reference's
    [anchor][k] column order: checkpoints and the torch weights-transplant
    remain compatible."""

    num_anchor_per_loc: int = 9
    box_code_size: int = 7
    compute_dtype: Any = jnp.bfloat16
    @nn.compact
    def __call__(
        self, x: jax.Array | tuple[jax.Array, jax.Array]
    ) -> dict[str, jax.Array]:
        parity_split = isinstance(x, tuple)
        cin = (x[0] if parity_split else x).shape[-1]
        a, code = self.num_anchor_per_loc, self.box_code_size
        dt = self.compute_dtype

        # nn.Dense-compatible param trees (head/conv_cls/{kernel,bias}, [a][k]
        # column order), permuted weight-side to [k][a]
        w_cls, b_cls = _DenseParams(a * 1, name="conv_cls")(cin, a, 1)
        w_box, b_box = _DenseParams(a * code, name="conv_box")(cin, a, code)
        w_dir, b_dir = _DenseParams(a * 2, name="conv_dir")(cin, a, 2)

        wf = jnp.concatenate([w_cls, w_box, w_dir], axis=1)  # (cin, A·10)
        bf = jnp.concatenate([b_cls, b_box, b_dir])

        # (A·10, cin) x (N, H, W, cin) contracted on cin → (A·10, N, H, W).
        # The dot consumes the 4D map directly — no (n, h·w, cin) reshape
        # (which materialized extra copies under the training graph's
        # space-to-batch layouts) — and its output keeps the spatial dims
        # minor, which the preds contract preserves end-to-end.
        # MEASURED ALTERNATIVE (round 3, rejected): running the head as a
        # 1x1 conv_general so it rides the space-to-batch transform was
        # SLOWER on both paths (10cm inference 25.8→29.1 ms, train
        # 63.9→67.8 ms) — the 90-channel output transpose+relayout out of
        # s2b form costs more than the dot's input handling. Keep the dot.
        def head_dot(feats):
            # The train graph's 4D form gets rewritten by XLA into a
            # degenerate padded-window convolution running at ~31 TF/s
            # (tools/train_mfu.py) — but a flattened (N·H·W, cin) 2D dot
            # that dodges the rewrite was MEASURED SLOWER (round 5, b=2
            # 20 cm 45.3/45.9 → 47.0-47.4 ms/step; 10 cm 198 ms): the
            # flatten un-fuses the neck concat epilogue and its relayout
            # costs more than the dot emitter saves. Keep the 4D dot.
            yt = jax.lax.dot_general(
                wf.T.astype(dt), feats.astype(dt), (((1,), (3,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (yt + bf[:, None, None, None]).astype(dt)

        def split_groups(yt):
            # yt (A·10, n, h, w*): rows are [k][anchor] ordered — group
            # slices and the (k, anchor) splits move only MAJOR axes (the
            # spatial dims stay minor), so they are layout-free
            s = yt.shape[1:]
            cls = yt[:a].transpose(1, 0, 2, 3)[:, None]       # (n, 1, a, h, w*)
            box = (
                yt[a : a * (1 + code)]
                .reshape((code, a) + s)
                .transpose(2, 0, 1, 3, 4)                     # (n, code, a, h, w*)
            )
            dire = (
                yt[a * (1 + code) :]
                .reshape((2, a) + s)
                .transpose(2, 0, 1, 3, 4)                     # (n, 2, a, h, w*)
            )
            return cls, box, dire

        if parity_split:
            # packed neck form: one dot per column parity over its own
            # (N, H, W/2, 320) concat; the predictions stay a per-parity
            # PAIR — full-map column w = 2·w2 + p — and the decode stage
            # consumes the pair directly (postprocess._decode parity path),
            # so the (w2, 2)→w interleave relayout of the 90-channel output
            # never exists
            groups = [split_groups(head_dot(xp)) for xp in x]
            return {
                "cls_preds": (groups[0][0], groups[1][0]),
                "box_preds": (groups[0][1], groups[1][1]),
                "dir_preds": (groups[0][2], groups[1][2]),
            }
        cls, box, dire = split_groups(head_dot(x))
        return {"cls_preds": cls, "box_preds": box, "dir_preds": dire}


class _DenseParams(nn.Module):
    """Holds nn.Dense-shaped parameters (kernel (in, out), bias (out,)) with
    the reference's [anchor][k] output-column order, returning them permuted
    to [k][anchor] for the fused transposed head matmul."""

    features: int

    @nn.compact
    def __call__(self, cin: int, a: int, k: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (cin, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        kp = kernel.reshape(cin, a, k).transpose(0, 2, 1).reshape(cin, a * k)
        bp = bias.reshape(a, k).T.reshape(-1)
        return kp, bp


class MultiHead(nn.Module):
    """Per-class heads over the shared RPN features, concatenated into the
    same anchor-major channel-major contract as SharedHead.

    The reference's head evolution (SingleHead/MultiHead(s),
    networks/pointpillars8_shared.py:184-296, and the per-class variants in
    networks/old/) shows this extensibility axis; kept as a config-selectable
    alternative (`head: "multi"`). Output contract is identical to
    SharedHead so losses/postprocess are head-agnostic."""

    anchors_per_class: tuple[int, ...] = (6, 1, 2)
    box_code_size: int = 7
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        n, h, w, _ = x.shape
        code = self.box_code_size
        dt = self.compute_dtype
        cls_l, box_l, dir_l = [], [], []
        for ci, a in enumerate(self.anchors_per_class):
            feat = nn.Dense(64, dtype=dt, name=f"head{ci}_reduce")(x)
            feat = nn.relu(feat)
            cin = feat.shape[-1]
            w_cls, b_cls = _DenseParams(a * 1, name=f"head{ci}_cls")(cin, a, 1)
            w_box, b_box = _DenseParams(a * code, name=f"head{ci}_box")(cin, a, code)
            w_dir, b_dir = _DenseParams(a * 2, name=f"head{ci}_dir")(cin, a, 2)
            wf = jnp.concatenate([w_cls, w_box, w_dir], axis=1)
            bf = jnp.concatenate([b_cls, b_box, b_dir])
            yt = jax.lax.dot_general(
                wf.T.astype(dt), feat, (((1,), (3,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            yt = (yt + bf[:, None, None, None]).astype(dt)  # (a·10, n, h, w)
            s = yt.shape[1:]
            cls_l.append(yt[:a].transpose(1, 0, 2, 3)[:, None])
            box_l.append(
                yt[a : a * (1 + code)].reshape((code, a) + s).transpose(2, 0, 1, 3, 4)
            )
            dir_l.append(
                yt[a * (1 + code) :].reshape((2, a) + s).transpose(2, 0, 1, 3, 4)
            )

        # classes concatenate along the anchor-channel axis — the global
        # [class][size][rot] channel order of anchors.build_anchors
        return {
            "cls_preds": jnp.concatenate(cls_l, axis=2),
            "box_preds": jnp.concatenate(box_l, axis=2),
            "dir_preds": jnp.concatenate(dir_l, axis=2),
        }


class PointPillars(nn.Module):
    """PFN → scatter → RPN → SharedHead. Reference:
    networks/pointpillars8_shared.py:346-382 (minus the per-stage
    cuda.synchronize timing, which lives in utils/timing.py instead)."""

    cfg: Config
    # Optional jax.sharding.Sharding for the dense BEV canvas (B, nx, ny, C):
    # when set, a with_sharding_constraint after the scatter lets GSPMD
    # spatially partition the whole conv stack (halo exchanges over ICI) —
    # the multi-chip single-frame latency path (parallel/mesh.make_spatial_infer).
    canvas_sharding: Any = None

    @nn.compact
    def __call__(
        self,
        voxels: jax.Array,       # (B, V, P, C)
        num_points: jax.Array,   # (B, V)
        coors: jax.Array,        # (B, V, 3)
        train: bool = False,
        axis_name: str | None = None,  # sync-BN axis (shard_map DP step)
    ) -> dict[str, jax.Array]:
        dtype = jnp.dtype(self.cfg.compute_dtype)
        pillar_features = PFN(
            voxel_size=tuple(self.cfg.voxel_size),
            offset=tuple(self.cfg.detection_offset),
            compute_dtype=dtype,
            name="pfn",
        )(voxels, num_points, coors, train, axis_name)
        grid_xy = (self.cfg.grid_size[0], self.cfg.grid_size[1])
        pack = (
            getattr(self.cfg, "pack_w", True)
            and grid_xy[0] % 2 == 0
            and grid_xy[1] % 4 == 0
        )
        on_tpu = jax.default_backend() == "tpu"
        # the XLA 16k-row scatter lowers to a serialized per-index update
        # (~1.5 ms/frame); the Pallas builders stream the canvas as one-hot
        # MXU matmuls (kernels/scatter_pallas.py)
        # blocked block0 (Config.block0_blocked / block0_blocked_train): the
        # scatter emits halo'd H-blocks and RPN runs all of block0
        # batch-over-blocks. Inference motive: XLA's space-to-batch pad +
        # blocking copy of the 4C canvas never exists. Training motive: at
        # batch ≥ 2 s2b never fires and the dense block0 convs run the slow
        # batch-2 emitters — blocked runs them batch-(B·nblk). Excluded
        # under spatial sharding (the canvas constraint needs the plain
        # dense layout).
        nblk, halo = block0_blocking(grid_xy)
        # Training engages blocked only at per-device batch ≤ 2 — the
        # measured win region (20 cm b=2 49.06→45.03, 10 cm b=2 196→181;
        # b=4 78.8→82.1 and b=8 145.7→163.7 REGRESS: at larger batch the
        # dense emitters are already efficient and the +28% halo MACs
        # dominate — BASELINE.md round-5 train-lever table). Static at
        # trace time, so one config serves any batch size safely.
        blocked_flag = (
            getattr(self.cfg, "block0_blocked_train", False) and voxels.shape[0] <= 2
            if train
            else getattr(self.cfg, "block0_blocked", False)
        )
        blocked = (
            pack and nblk > 1 and blocked_flag and self.canvas_sharding is None
        )
        if blocked:
            from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_s2d_blocked

            canvas = scatter_to_bev_s2d_blocked(
                pillar_features, coors, grid_xy, nblk, halo, not on_tpu
            )
        elif pack:
            if on_tpu:
                from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_s2d_pallas

                # inference: emit the canvas physically W-major — the layout
                # XLA's space-to-batch wants for the batch-1 entry conv, so
                # the full-canvas H↔W relayout copy is folded away. Training
                # fences space-to-batch out (train/trainer.py) and keeps the
                # H-major order the unfenced convs prefer.
                canvas = scatter_to_bev_s2d_pallas(
                    pillar_features, coors, grid_xy, False, not train
                )
            else:
                canvas = scatter_to_bev_s2d(pillar_features, coors, grid_xy)
        elif on_tpu:
            from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_pallas

            canvas = scatter_to_bev_pallas(pillar_features, coors, grid_xy)
        else:
            canvas = scatter_to_bev(pillar_features, coors, grid_xy)
        if self.canvas_sharding is not None:
            # Pin the canvas's x-axis sharding here and let GSPMD propagate it
            # through the backbone: every conv partitions spatially (XLA
            # inserts the halo exchanges), and the replicated-output
            # constraint on the enclosing jit places the gather after the head.
            canvas = jax.lax.with_sharding_constraint(canvas, self.canvas_sharding)
        # Gram-stat fused branch INs: inference-only (training keeps the
        # analytic-VJP _instance_norm path that the 48.7 ms step was tuned
        # around), packed-only, and config-gated for A/B (`fuse_in_stats`).
        fuse_stats = (
            pack and not train and getattr(self.cfg, "fuse_in_stats", True)
        )
        shared_head = getattr(self.cfg, "head", "shared") == "shared"
        # split_out is inference-only: in training the two half-width head
        # dots + the backward of the output interleave measured +1.9 ms/step
        # (b=2, 50.6 vs 48.7) while the merged concat path's bwd is a plain
        # split — the win only exists where the neck map has no consumers
        # besides the head (20 cm inference 6.23 -> 5.96 ms device).
        # Config.split_head gates it per geometry (tune lever).
        rpn_features = RPN(
            compute_dtype=dtype, pack_w=pack, fuse_in_stats=fuse_stats,
            split_out=pack and shared_head and not train
            and getattr(self.cfg, "split_head", True),
            block0_blocked=blocked,
            # late blocking shares the block0 lever's physics and win region
            # (b=2 dense emitters): train-only, per-device batch <= 2, not
            # under spatial sharding. Inference never needs it — at batch 1
            # space-to-batch already batches these convs over space.
            late_blocked=(
                train and voxels.shape[0] <= 2 and self.canvas_sharding is None
                and getattr(self.cfg, "late_blocked_train", False)
            ),
            name="rpn",
        )(canvas)
        if not shared_head:
            return MultiHead(
                anchors_per_class=tuple(
                    s.num_anchors_per_loc for s in self.cfg.class_specs
                ),
                box_code_size=self.cfg.box_code_size,
                compute_dtype=dtype,
                name="head",
            )(rpn_features)
        return SharedHead(
            num_anchor_per_loc=self.cfg.num_anchors_per_loc,
            box_code_size=self.cfg.box_code_size,
            compute_dtype=dtype,
            name="head",
        )(rpn_features)
