"""Device-mesh construction and sharded train/infer steps.

Scaling design (see SURVEY.md §2i / §5): this workload is a small conv net
(~5 M params) over large per-frame data, so the right TPU decomposition is
pure batch data-parallelism — params replicated, per-frame tensors sharded on
the batch axis over ICI. XLA inserts the gradient `psum` automatically from
the sharding annotations on one `jax.jit`; there is no hand-written
collective anywhere. (The reference has no distributed path at all: a single
`cuda:0` device, reference train.py:27.)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch with its leading axis split across the mesh."""
    return jax.device_put(batch, batch_sharded(mesh))


def make_sharded_train_step(trainer, mesh: Mesh):
    """The trainer's step jit-ted with params replicated and the batch
    sharded on the data axis; gradients all-reduce over ICI automatically."""
    return jax.jit(
        trainer.train_step,
        in_shardings=(replicated(mesh), batch_sharded(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh), replicated(mesh)),
        donate_argnums=(0,),
    )


def make_sharded_infer(detector, mesh: Mesh):
    """Batched inference sharded on the data axis: (B, max_points, C) →
    per-frame Detections, for throughput eval over all chips."""

    def infer_batch(variables, points, num_points):
        return jax.vmap(lambda p, n: detector.infer(variables, p, n))(points, num_points)

    return jax.jit(
        infer_batch,
        in_shardings=(replicated(mesh), batch_sharded(mesh), batch_sharded(mesh)),
        out_shardings=batch_sharded(mesh),
    )
