"""Pallas TPU kernel: greedy NMS in a single kernel dispatch.

TPU-native counterpart of the reference's CUDA bitmask NMS
(reference framework/nms.py:119-150 `nms_kernel` + the host numba sweep
:85-102). The reference splits mask-build (GPU) from the greedy sweep
(host); XLA versions of the sweep pay per-iteration loop overhead. Here both
phases run inside ONE Pallas kernel:

  phase 1 (VPU): pairwise +1-pixel-convention IoU over the (K, K) grid →
      suppression matrix in VMEM scratch (upper triangle ∧ valid);
  phase 2: the exact greedy sweep as a `fori_loop` over rows entirely
      in-register/VMEM — `removed = max(removed, row_i · keep_i)` — with no
      kernel-boundary or loop-dispatch cost per step.

K must be a multiple of 128 (lane width); callers pad. Returns an int32
(K,) 0/1 keep vector; the `post_max_size` rank cap is applied by the caller
(cheap XLA cumsum), matching ops/nms.greedy_nms semantics exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, keep_ref, sup_ref, *, iou_threshold: float):
    k = boxes_ref.shape[0]
    b = boxes_ref[:]                       # (K, 4) f32
    x1 = b[:, 0]
    y1 = b[:, 1]
    x2 = b[:, 2]
    y2 = b[:, 3]

    # pairwise IoU with the reference's +1 pixel convention (nms.py:105-116)
    iw = jnp.maximum(
        jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(x1[:, None], x1[None, :]) + 1.0,
        0.0,
    )
    ih = jnp.maximum(
        jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(y1[:, None], y1[None, :]) + 1.0,
        0.0,
    )
    inter = iw * ih
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    union = area[:, None] + area[None, :] - inter
    iou = inter / union

    valid = valid_ref[:, 0] > 0            # (K,)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    sup_ref[:, :] = jnp.where(
        (iou > iou_threshold)
        & (row_ids < col_ids)
        & valid[:, None]
        & valid[None, :],
        1.0,
        0.0,
    )
    # Exact greedy via frontier iteration (no dynamic indexing, which Mosaic
    # lowers poorly — the previous per-row sweep cost ~8ms/call):
    # each round KEEPS every candidate with no higher-scored live overlapper
    # (their suppressors are all dead ⇒ decided) and kills what they
    # suppress. ≥1 box is decided per round (the best remaining is never
    # blocked), so k rounds guarantee exactness; each round is two
    # (1,K)·(K,K) matvecs on the MXU.
    kept0 = jnp.zeros((1, k), jnp.float32)
    remaining0 = valid.astype(jnp.float32)[None, :]

    def round_(state):
        kept, remaining = state
        sup = sup_ref[:, :]
        blocked = jnp.dot(remaining, sup, preferred_element_type=jnp.float32)
        ready = remaining * jnp.where(blocked > 0.0, 0.0, 1.0)
        suppressed = jnp.dot(ready, sup, preferred_element_type=jnp.float32)
        kept = jnp.maximum(kept, ready)
        remaining = remaining * (1.0 - ready) * jnp.where(suppressed > 0.0, 0.0, 1.0)
        return kept, remaining

    # while_loop exits as soon as everything is decided — real data resolves
    # in ~5-20 rounds; the k-round bound above is the worst case
    kept, _ = jax.lax.while_loop(
        lambda s: jnp.sum(s[1]) > 0.0,
        round_,
        (kept0, remaining0),
    )
    keep_ref[:, 0] = (valid & (kept[0, :] > 0.0)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_keep_pallas(
    boxes: jax.Array,        # (K, 4) minmax, descending-score order, K % 128 == 0
    valid: jax.Array,        # (K,) bool
    iou_threshold: float,
    interpret: bool = False,
) -> jax.Array:              # (K,) bool
    k = boxes.shape[0]
    assert k % 128 == 0, f"K={k} must be a multiple of 128 (pad the inputs)"
    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=iou_threshold),
        out_shape=jax.ShapeDtypeStruct((k, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k, k), jnp.float32),
        ],
        interpret=interpret,
    )(boxes, valid[:, None].astype(jnp.int32))
    return keep[:, 0] > 0


def greedy_nms_pallas(
    boxes: jax.Array,
    valid: jax.Array,
    iou_threshold: float,
    post_max_size: int,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.nms.greedy_nms backed by the Pallas kernel.

    Pads K up to a lane multiple, runs the kernel, applies the rank cap."""
    k = boxes.shape[0]
    kp = -(-k // 128) * 128
    if kp != k:
        boxes = jnp.pad(boxes, ((0, kp - k), (0, 0)))
        valid = jnp.pad(valid, (0, kp - k))
    keep = nms_keep_pallas(boxes, valid, iou_threshold, interpret)[:k]
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    return keep & (rank < post_max_size)
