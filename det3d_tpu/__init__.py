"""det3d_tpu — a TPU-native PointPillars-style LiDAR 3D object detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
CUDA/PyTorch framework (1005088h/3d_object_detection): pillar voxelization →
pillar feature net → scatter-to-BEV → 2D RPN → shared detection head →
decode/NMS → KITTI-protocol mAP eval, plus training (focal/smooth-L1/dir
losses, Adam, checkpointing), augmentation, and data-parallel scaling over a
TPU device mesh.

Everything between raw points and final boxes runs on-device under one
`jax.jit`, with static shapes throughout (pad-to-max contracts mirror the
reference's `max_voxels` / `max_num_points` caps).
"""

__version__ = "0.1.0"

from det3d_tpu.config import Config, load_config


def __getattr__(name):
    # lazy re-exports: keep `import det3d_tpu` light (no jax/flax import cost
    # for host-only tools) while exposing the main entry points at top level
    if name == "Detector":
        from det3d_tpu.pipeline import Detector

        return Detector
    if name == "Trainer":
        from det3d_tpu.train.trainer import Trainer

        return Trainer
    if name == "ExportedDetector":
        from det3d_tpu.deploy.runtime import ExportedDetector

        return ExportedDetector
    raise AttributeError(name)


__all__ = [
    "Config",
    "load_config",
    "Detector",
    "Trainer",
    "ExportedDetector",
    "__version__",
]
