"""Fixed-shape greedy NMS, fully on device.

Replaces the reference's three-stage host/GPU ping-pong — host score sort →
numba.cuda 64x64-tile bitmask kernel → host numba greedy sweep (reference:
framework/nms.py:6-40, :119-150, :85-102) — with a single XLA computation:
a pairwise-IoU suppression matrix plus a compiled sequential sweep
(`lax.fori_loop`, which on TPU is a hardware loop, not per-step dispatch).

Parity notes:
  * the reference's `iou_device` uses the legacy *pixel* convention, adding
    +1 to widths/heights/areas (framework/nms.py:105-116) even though the
    boxes are metric; reproduced verbatim so keep-sets match;
  * boxes must arrive sorted by descending score (the caller's `top_k`
    provides this, mirroring the host argsort at nms.py:21);
  * output is a fixed-size boolean keep mask capped at `post_max_size`
    (the `keep[:post_max_size]` slice at framework/inference.py:697-698).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_pixel_convention(boxes: jax.Array) -> jax.Array:
    """Pairwise IoU of (K, 4) minmax boxes with the +1 pixel convention of
    the reference CUDA kernel (framework/nms.py:105-116)."""
    a = boxes[:, None, :]
    b = boxes[None, :, :]
    width = jnp.maximum(
        jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]) + 1.0, 0.0
    )
    height = jnp.maximum(
        jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]) + 1.0, 0.0
    )
    inter = width * height
    area_a = (a[..., 2] - a[..., 0] + 1.0) * (a[..., 3] - a[..., 1] + 1.0)
    area_b = (b[..., 2] - b[..., 0] + 1.0) * (b[..., 3] - b[..., 1] + 1.0)
    return inter / (area_a + area_b - inter)


def greedy_nms(
    boxes: jax.Array,          # (K, 4) minmax, sorted by descending score
    valid: jax.Array,          # (K,) bool
    iou_threshold: float,
    post_max_size: int,
) -> jax.Array:                # (K,) bool keep mask (≤ post_max_size set)
    """Exact greedy NMS on pre-sorted boxes with a fixed output budget.

    Instead of the K-step sequential sweep (the reference's host loop,
    framework/nms.py:85-102 — latency-poison on TPU at K=1000), run a
    frontier `while_loop`: every round, KEEP every candidate with no
    higher-scored *live* overlapper (all such boxes are decided — their
    potential suppressors are all dead), then kill everything they suppress.
    The kept set is identical to sequential greedy; rounds needed equal the
    depth of the suppression chains (a handful in practice), and each round
    is one (K,K)·(K,) masked matvec on the MXU.
    """
    k = boxes.shape[0]
    iou = iou_pixel_convention(boxes)
    idx = jnp.arange(k, dtype=jnp.int32)
    # overlap[i, j]: higher-scored i suppresses j (strict upper triangle)
    overlap = (
        (iou > iou_threshold)
        & valid[None, :]
        & valid[:, None]
        & (idx[:, None] < idx[None, :])
    )
    overlap_f = overlap.astype(jnp.float32)

    def cond(state):
        _, remaining = state
        return jnp.any(remaining)

    def body(state):
        kept, remaining = state
        rem_f = remaining.astype(jnp.float32)
        blocked = (rem_f @ overlap_f) > 0.0          # ∃ live higher-scored overlapper
        ready = remaining & ~blocked                  # decided keeps this round
        suppressed = (ready.astype(jnp.float32) @ overlap_f) > 0.0
        return kept | ready, remaining & ~ready & ~suppressed

    kept, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((k,), bool), valid)
    )
    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    return kept & (rank < post_max_size)
