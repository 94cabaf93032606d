"""Multi-chip scaling over a `jax.sharding.Mesh` (data parallel over ICI).

The reference is strictly single-GPU (SURVEY.md §2i: no torch.distributed,
no NCCL); the TPU-native scaling story is batch data-parallelism with XLA
collectives over ICI, expressed as shardings on one jit — no custom
transport."""

from det3d_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    make_sharded_train_step,
    make_sharded_infer,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "make_sharded_train_step",
    "make_sharded_infer",
]
