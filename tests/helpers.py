"""Shared tiny-config helpers: a 16x16 BEV grid with 8x8 feature maps keeps
CPU test compiles fast while exercising every real code path."""

import dataclasses

import numpy as np

from det3d_tpu.config import ClassSpec, load_config


def small_cfg(max_points=256, max_voxels=64, max_num_points=5, batch_size=1):
    cfg = load_config(
        {
            "detection_range": [-8.0, -8.0, -2.5, 8.0, 8.0, 8.5],
            "center_limit": [-8.0, -8.0, -10.0, 8.0, 8.0, 10.0],
            "voxel_size": [1.0, 1.0, 11.0],
            "max_voxels": max_voxels,
            "max_num_points": max_num_points,
            "batch_size": batch_size,
            "max_points": max_points,
            "max_gt_boxes": 8,
            "compute_dtype": "float32",
        }
    )
    specs = (
        dataclasses.replace(
            cfg.class_specs[0],
            sizes=((4.6, 2.10, 1.8),),
            rotations=(0.0, 1.5707963267948966),
            feature_map_size=(8, 8, 1),
        ),
        dataclasses.replace(cfg.class_specs[1], feature_map_size=(8, 8, 1)),
        dataclasses.replace(cfg.class_specs[2], feature_map_size=(8, 8, 1)),
    )
    return cfg.replace(class_specs=specs)


def random_cloud(n, seed=0, lo=-7.5, hi=7.5):
    r = np.random.RandomState(seed)
    pts = np.zeros((n, 4), np.float32)
    pts[:, :2] = r.uniform(lo, hi, (n, 2))
    pts[:, 2] = r.uniform(-2, 8, n)
    pts[:, 3] = r.uniform(0, 1, n)
    return pts
