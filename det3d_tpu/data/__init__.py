"""Host data plane: dataset/infos loading, augmentation, batching,
offline info creation. Everything here is numpy + file IO; all per-point
compute (voxelize, mask, targets) runs on device (see pipeline/targets)."""
