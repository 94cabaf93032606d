"""Training subsystem: on-device data path + train step, running metrics,
orbax checkpointing."""

from det3d_tpu.train.trainer import Trainer, TrainState
from det3d_tpu.train.metrics import RunningMetrics

__all__ = ["Trainer", "TrainState", "RunningMetrics"]
