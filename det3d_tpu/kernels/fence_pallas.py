"""A no-op Pallas custom call used as a deliberate space-to-batch fence.

XLA's space-to-batch converter refuses to transform convolutions whose
outputs (transitively) feed a custom call (measured in round 2 via HLO
bisection — the discovery behind the two-stage inference dispatch). For
BATCH-1 inference that transform is a ~3x conv win and must be protected;
for the b>=2 TRAINING step the round-3 trace shows the opposite economics:
convs are only ~3.8 ms of a 63.9 ms step while the s2b restructuring
shreds the graph into ~26 ms of elementwise fusion glue plus ~15 ms of
relayout copies. Passing the head predictions through this identity custom
call turns the transform OFF for every conv upstream of the loss — nothing
else about the math changes (the kernel is a straight VMEM copy, and its
VJP is the identity).
"""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


# One VMEM chunk budget for both the divisor search and the pad fallback:
# double-buffered in+out f32 blocks of this many elements (4 MB total) stay
# well inside the 16 MB scoped-VMEM limit.
_CHUNK_CAP = 256 * 1024


def _pick_chunk(a: int, cap: int = _CHUNK_CAP) -> int | None:
    """Largest 128-multiple divisor of `a` that is ≤ cap (keeps the
    double-buffered in+out blocks well inside the 16 MB scoped-VMEM limit);
    None when no such divisor exists (the caller pads instead — a full-size
    block of a large non-128-divisible dim would blow the VMEM budget)."""
    best = None
    c = 128
    while c <= min(a, cap):
        if a % c == 0:
            best = c
        c += 128
    return best


def _fence_impl(x: jax.Array, interpret: bool) -> jax.Array:
    b, k, a = x.shape
    chunk = _pick_chunk(a)
    apad = a
    if chunk is None:
        # no 128-multiple divisor ≤ cap: pad the chunked axis instead of
        # falling back to one full-size (possibly tens-of-MB) VMEM block
        chunk = min(_CHUNK_CAP, -(-a // 128) * 128)
        apad = -(-a // chunk) * chunk
    # dummy middle dim: Mosaic requires the last two BLOCK dims be
    # (8, 128)-divisible or full-size; (1, 1, 1, chunk) blocks of a
    # (B, K, 1, A) array satisfy that for any K
    x4 = x[:, :, None, :]
    if apad != a:
        import jax.numpy as jnp

        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, 0), (0, apad - a)))
    out = pl.pallas_call(
        _copy_kernel,
        grid=(b, k, apad // chunk),
        in_specs=[
            pl.BlockSpec((1, 1, 1, chunk), lambda bi, ki, ci: (bi, ki, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, chunk), lambda bi, ki, ci: (bi, ki, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, 1, apad), x.dtype),
        interpret=interpret,
    )(x4)
    return out[:, :, 0, :a]


@jax.custom_vjp
def s2b_fence(x: jax.Array) -> jax.Array:
    """Identity via a Pallas custom call (TPU); plain identity elsewhere.
    Accepts any rank ≥ 1: trailing dims flatten into the chunked axis (the
    spatial preds contract made cls_preds 5D — (B, k, nch, fx, fy)).
    Differentiable: the VJP passes cotangents through."""
    if jax.default_backend() != "tpu" or x.ndim == 0 or x.size == 0:
        return x
    if x.ndim == 3:
        return _fence_impl(x, interpret=False)
    # non-3D: flatten EVERYTHING into the chunked axis. Keeping dims as grid
    # axes is pathological for e.g. rank-1 inputs ((N,1,1) → N grid steps of
    # one element each padded to 128 lanes); one flat axis always chunks well.
    return _fence_impl(x.reshape(1, 1, -1), interpret=False).reshape(x.shape)


def _fence_fwd(x):
    return s2b_fence(x), None


def _fence_bwd(_, g):
    return (g,)


s2b_fence.defvjp(_fence_fwd, _fence_bwd)


def fence_any(x: jax.Array) -> jax.Array:
    """Identity fence for an arbitrary-shape array. Used on the
    weight-gradient pytree: the forward fence only reaches convs upstream of
    the loss, while wgrad convolutions' outputs ARE the grads — fencing them
    keeps space-to-batch out of the backward pass too. (s2b_fence's non-3D
    branch performs exactly this flatten-fence-restore.)"""
    return s2b_fence(x)
