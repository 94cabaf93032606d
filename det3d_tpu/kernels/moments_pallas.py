"""Pallas TPU kernel: per-channel sum and sum-of-squares in one pass.

Feeds the InstanceNorm statistics (models/pointpillars._instance_norm,
counterpart of the reference's nn.InstanceNorm2d eps=1e-3,
networks/pointpillars8_shared.py:128). XLA's native column reduce of a
(HW, C) bf16 activation map measured ~10x off memory bandwidth (1.25 ms for
the 400²x64 entry-IN stats), and a ones-vector matmul formulation gets
canonicalized right back into that reduce. This kernel streams the map once,
reducing each row-tile on the VPU and accumulating into a (8, C) f32 block
resident in VMEM across grid steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _moments_kernel(x_ref, out_ref):
    xf = x_ref[:].astype(jnp.float32)
    s1 = jnp.sum(xf, axis=0, keepdims=True)          # (1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0:1, :] += s1
    out_ref[1:2, :] += s2


def _moments_call(x2d: jax.Array, interpret: bool):
    n, c = x2d.shape
    tile = 2048
    while n % tile != 0:
        tile //= 2
    out = pl.pallas_call(
        _moments_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((8, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, c), jnp.float32),
        interpret=interpret,
    )(x2d)
    return out[0], out[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def column_moments(x2d: jax.Array, interpret: bool = False):
    """(N, C) → (sum, sumsq), each (C,) f32, accumulated in f32.

    Differentiable (custom VJP — the InstanceNorm statistics sit on the
    training gradient path): d sum/dx = 1, d sumsq/dx = 2x."""
    return _moments_call(x2d, interpret)


def _moments_fwd(x2d, interpret):
    return _moments_call(x2d, interpret), x2d


def _moments_bwd(interpret, x2d, g):
    g1, g2 = g
    gx = g1[None, :] + 2.0 * g2[None, :] * x2d.astype(jnp.float32)
    return (gx.astype(x2d.dtype),)


column_moments.defvjp(_moments_fwd, _moments_bwd)
