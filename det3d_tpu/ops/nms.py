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
    """Exact greedy NMS on pre-sorted boxes with a fixed output budget."""
    k = boxes.shape[0]
    iou = iou_pixel_convention(boxes)
    overlap = (iou > iou_threshold) & valid[None, :] & valid[:, None]
    idx = jnp.arange(k, dtype=jnp.int32)

    def body(i, keep):
        # box i, if still alive, suppresses every later overlapping box
        suppress = overlap[i] & (idx > i) & keep[i]
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, k, body, valid)
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    return keep & (rank < post_max_size)
