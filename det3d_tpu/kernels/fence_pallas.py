"""Pallas layout fence: an identity copy that pins default layouts.

Why this exists: XLA layout assignment propagates custom-call operand
constraints BACKWARD through elementwise/reshape chains. In this pipeline,
`lax.approx_max_k` (TPU ApproxTopK custom call) in the post-processor pushed
its exotic 1D-tiled layout demand back through the head into the whole RPN
conv stack, which disabled the space-to-batch conv transform and slowed
every convolution ~3x (+2.4M estimated cycles; see tools HLO bisects,
/tmp/s2b_bisect*).

A pallas_call is itself a custom call with FIXED default layouts on operands
and results, so placing one between the model outputs and the post-processor
stops the propagation: the model keeps its natural layouts (space-to-batch
fires), and any relayout the top-k wants is paid once on the small
prediction tensors instead of on every activation map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def _pick_div(n: int, cap: int, lane: bool) -> int:
    """Largest divisor of n up to cap (preferring lane/sublane multiples)."""
    m = 128 if lane else 8
    for t in range(min(n, cap), 0, -1):
        if n % t == 0 and (t % m == 0 or t == n or t < m):
            return t
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def layout_fence(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Identity on a (R, C) array via a trivial Pallas copy; tiles over
    whichever dimension is large so blocks stay VMEM-sized."""
    r, c = x.shape
    budget = 1024 * 1024  # per block; Pallas double-buffers in+out (~4x)
    if c >= r:
        tile = _pick_div(c, 32768, lane=True)
        while r * tile * x.dtype.itemsize > budget and tile > 128:
            tile = _pick_div(c, tile - 1, lane=True)
        grid, block, imap = c // tile, (r, tile), (lambda i: (0, i))
    else:
        tile = _pick_div(r, 32768, lane=False)
        while tile * c * x.dtype.itemsize > budget and tile > 8:
            tile = _pick_div(r, tile - 1, lane=False)
        grid, block, imap = r // tile, (tile, c), (lambda i: (i, 0))
    return pl.pallas_call(
        _copy_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(block, imap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=interpret,
    )(x)
