"""Device-mesh construction and sharded train/infer steps.

Scaling design (see SURVEY.md §2i / §5): this workload is a small conv net
(~5 M params) over large per-frame data, so the right TPU decomposition is
pure batch data-parallelism for throughput — params replicated, per-frame
tensors sharded on the batch axis over ICI, expressed as a `shard_map` whose
body is the full per-device step (gradient `pmean` + sync-BN `psum` ride
ICI), so the train path's Pallas custom calls run per-device instead of
being replicated by GSPMD. The within-sample spatial modes keep GSPMD
(conv halo exchange needs the compiler); the hybrid mode composes both via
partial-manual shard_map (manual `data`, auto `spatial`). (The reference
has no distributed path at all: a single `cuda:0` device, train.py:27.)

For single-frame LATENCY, `make_spatial_infer` instead partitions one frame
spatially: the BEV canvas is pinned sharded along x and GSPMD partitions the
conv stack across the mesh with automatic halo exchanges — batch parallelism
cannot shrink the latency of one frame, spatial partitioning can.

For large-canvas TRAINING, `make_spatial_train` combines both on a 2D
(data, spatial) mesh: batch sharded over `data`, every conv activation
(forward and backward) sharded along x over `spatial` — the activation-memory
scaling mode pure DP can't provide.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def _take_devices(n_devices: int | None):
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return devices


def make_mesh(n_devices: int | None = None) -> Mesh:
    return Mesh(np.asarray(_take_devices(n_devices)), (DATA_AXIS,))


def make_spatial_mesh(n_devices: int | None = None) -> Mesh:
    """1D mesh over the SPATIAL axis for single-frame latency scaling."""
    return Mesh(np.asarray(_take_devices(n_devices)), (SPATIAL_AXIS,))


def make_hybrid_mesh(dp: int, sp: int) -> Mesh:
    """2D (data, spatial) mesh for hybrid-parallel training: `dp` data-parallel
    groups × `sp`-way spatial partitioning within each group."""
    devices = _take_devices(dp * sp)
    return Mesh(np.asarray(devices).reshape(dp, sp), (DATA_AXIS, SPATIAL_AXIS))


def collective_counts(hlo_text: str) -> dict[str, int]:
    """Count the cross-device collectives in a compiled HLO module.

    Structural scaling evidence: asserts WHAT communication XLA inserted for
    a given mesh, independent of hardware (tests/test_parallel.py pins the
    expected shapes; tools/scaling_evidence.py prints the per-mesh-size
    table for docs/SCALING.md). Async pairs (`-start`/`-done`) count once."""
    import re

    counts: dict[str, int] = {}
    for op in ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all"):
        # async starts have TUPLE result types containing spaces
        # (`%x = (f32[..], f32[..]) all-reduce-start(`) — match the result
        # type non-greedily instead of as one token; `-done` halves are
        # excluded so each async pair counts once
        n = len(re.findall(rf"= .{{0,400}}? {op}(?:-start)?\(", hlo_text))
        if n:
            counts[op] = n
    return counts


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch with its leading axis split across the mesh."""
    return jax.device_put(batch, batch_sharded(mesh))


def _shard_map_step(trainer, mesh: Mesh, manual_axes: frozenset | None = None):
    """trainer.train_step as a jitted shard_map over the data axis.

    `manual_axes` limits which mesh axes are manual (partial-manual mode:
    remaining axes stay GSPMD-auto inside the body); None = all manual.
    out_specs are replicated — the post-pmean update is identical on every
    device — but the Pallas custom calls block jax's static replication
    checker, hence check_vma=False."""
    kwargs = {} if manual_axes is None else {"axis_names": manual_axes}
    step = jax.shard_map(
        functools.partial(trainer.train_step, axis_name=DATA_AXIS),
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
        **kwargs,
    )
    return jax.jit(step, donate_argnums=(0,))


def make_sharded_train_step(trainer, mesh: Mesh):
    """Pure data-parallel training as a `shard_map` over the data axis:
    every device runs the FULL local step on its batch shard (params
    replicated) and gradients `pmean` over ICI inside the step
    (`Trainer.train_step(axis_name=...)`).

    shard_map — not GSPMD sharding annotations — is deliberate here: the
    TPU train step contains Pallas custom calls (fused target matcher, BEV
    canvas scatter, the s2b fences) that GSPMD cannot partition; under a
    plain sharded jit it would all-gather their operands and run them
    replicated on every chip. Inside shard_map each device executes them on
    its local shard, which is the whole point of data parallelism. The
    spatial modes below still use GSPMD — partitioning convolutions WITHIN
    one sample needs the compiler's halo machinery."""
    return _shard_map_step(trainer, mesh)


def make_spatial_train(cfg, mesh: Mesh, *, s2b_fence: bool = False, **trainer_kwargs):
    """Hybrid DP×SP training step over a 2D (data, spatial) mesh.

    Batch data-parallelism alone replicates each sample's activation
    footprint, and at large canvases (ntusl_10cm: 1600² grid) the conv
    activations — not the 5 M params — are the train-step memory ceiling.
    This mode shards the batch over `data` AND each sample's BEV canvas along
    x over `spatial`: from that single `with_sharding_constraint`
    (`PointPillars.canvas_sharding`) GSPMD partitions every convolution's
    forward, input-gradient, and weight-gradient spatially — halo exchanges
    and the wgrad partial-sum reduction ride ICI automatically — while
    gradients all-reduce over `data` exactly as in the pure-DP step. Activation
    memory per chip drops ~sp×; no hand-written collective anywhere.

    `s2b_fence` defaults OFF here (unlike `Trainer`): the fence is a Pallas
    no-op custom call GSPMD cannot partition, so it would force the head
    output replicated right before the loss and defeat the spatial sharding.

    Returns `(trainer, step_fn)` with `step_fn(state, batch)` semantics
    identical to `Trainer.train_step_jit` (validated against the
    single-device step in tests/test_parallel.py on the virtual CPU mesh).
    """
    from det3d_tpu.pipeline import Detector
    from det3d_tpu.train.trainer import Trainer

    if SPATIAL_AXIS not in mesh.axis_names or DATA_AXIS not in mesh.axis_names:
        raise ValueError(f"need a (data, spatial) mesh, got axes {mesh.axis_names}")
    # batch dim UNCONSTRAINED: GSPMD propagates it from the batch-sharded
    # inputs, and the model's init trace (batch 1) stays legal — a hard
    # P(data, ...) would demand divisibility by |data| even at init
    canvas_sharding = NamedSharding(mesh, P(P.UNCONSTRAINED, SPATIAL_AXIS))
    det = Detector(cfg, canvas_sharding=canvas_sharding)
    trainer = Trainer(cfg, det, s2b_fence=s2b_fence, **trainer_kwargs)
    # partial-manual shard_map: MANUAL over `data` (each DP group runs the
    # full local step — Pallas matcher/scatter execute per-group, grads
    # pmean + sync-BN psum over `data` inside Trainer.train_step), AUTO over
    # `spatial` (GSPMD still partitions the convolutions within each sample
    # from the canvas sharding constraint — halo exchanges need the
    # compiler). Validated vs the single-device step in tests/test_parallel.
    step = _shard_map_step(trainer, mesh, manual_axes=frozenset({DATA_AXIS}))
    return trainer, step


def make_spatial_infer(cfg, mesh: Mesh, **detector_kwargs):
    """Single-frame inference spatially partitioned over the mesh.

    Data parallelism shards frames; this shards ONE frame: the BEV canvas is
    pinned sharded along its x axis (`PointPillars.canvas_sharding`) and GSPMD
    propagates that through the backbone, partitioning every convolution
    spatially with automatic halo exchanges over ICI — the TPU analogue of
    model-parallel latency scaling (the reference is strictly single-GPU).
    The tiny pre-scatter stages (voxelize, PFN) and the post-head decode run
    replicated; the jit's replicated output sharding places the gather after
    the head, where tensors are already small.

    Returns `(detector, infer_fn)`: `infer_fn(variables, points, num_points)`
    → Detections, numerically equal to the single-device path (validated in
    tests/test_parallel.py on the virtual CPU mesh).
    """
    from det3d_tpu.pipeline import Detector

    # any 1D mesh works — shard the canvas's x axis over its (sole) axis
    axis = mesh.axis_names[0]
    canvas_sharding = NamedSharding(mesh, P(None, axis))
    det = Detector(cfg, canvas_sharding=canvas_sharding, **detector_kwargs)

    rep = replicated(mesh)
    stage1 = jax.jit(
        det.infer_candidates,
        in_shardings=(rep, rep, rep),
        out_shardings=rep,
    )
    stage2 = jax.jit(
        det.postprocess.finalize_stage, in_shardings=(rep,), out_shardings=rep
    )

    def infer_fn(variables, points, num_points):
        return stage2(stage1(variables, points, num_points))

    return det, infer_fn


def make_sharded_infer(detector, mesh: Mesh, two_stage: bool | None = None):
    """Batched inference sharded on the data axis: (B, max_points, C) →
    per-frame Detections, for throughput eval over all chips. shard_map for
    the same reason as the train step: the per-frame pipeline ends in the
    Pallas NMS custom call, which must run per-device on local frames, not
    replicated by GSPMD.

    Mirrors Detector.infer_jit's TWO chained dispatches on TPU (candidates |
    NMS): fusing the conv stack and the NMS custom call into one program
    structurally disables space-to-batch on every conv (~3x at the small
    per-device batches this path produces — CLAUDE.md); elsewhere one jit.
    `two_stage` overrides the backend default (tests exercise the staged
    split on the CPU mesh)."""
    def _sharded(fn, in_specs):
        return jax.jit(
            jax.shard_map(
                fn, mesh=mesh, in_specs=in_specs, out_specs=P(DATA_AXIS),
                check_vma=False,
            )
        )

    if two_stage is None:
        two_stage = jax.default_backend() == "tpu"
    if not two_stage:
        def infer_batch(variables, points, num_points):
            return jax.vmap(lambda p, n: detector.infer(variables, p, n))(points, num_points)

        return _sharded(infer_batch, (P(), P(DATA_AXIS), P(DATA_AXIS)))

    def cand_batch(variables, points, num_points):
        return jax.vmap(
            lambda p, n: detector.infer_candidates(variables, p, n)
        )(points, num_points)

    def finalize_batch(cands):
        return jax.vmap(detector.postprocess.finalize_stage)(cands)

    stage1 = _sharded(cand_batch, (P(), P(DATA_AXIS), P(DATA_AXIS)))
    stage2 = _sharded(finalize_batch, (P(DATA_AXIS),))

    def two_stage(variables, points, num_points):
        return stage2(stage1(variables, points, num_points))

    return two_stage
