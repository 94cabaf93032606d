"""Every shipped reference config must load and produce a shape-consistent
end-to-end pipeline.

The 10cm geometry (1600x1600 grid, 20k pillars) is too big to *execute* in a
CPU test, but `jax.eval_shape` traces the full points→detections pipeline
abstractly — it catches exactly the class of bug the stale JSON
feature_map_size caused (anchors on 400² vs a head on 800²) with zero FLOPs.
"""

import glob
import os

import numpy as np
import pytest

from det3d_tpu.config import load_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(glob.glob(os.path.join(CFG_DIR, "*.json")))


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=os.path.basename)
def test_loads_and_feature_map_is_half_grid(path):
    cfg = load_config(path)
    assert cfg.feature_map_size == (
        cfg.grid_size[0] // 2,
        cfg.grid_size[1] // 2,
        1,
    )
    for s in cfg.class_specs:
        assert s.feature_map_size == cfg.feature_map_size
    assert cfg.grid_size[0] > 0 and cfg.grid_size[1] > 0


@pytest.mark.parametrize(
    "name", ["ntusl_20cm.json", "ntusl_10cm.json"], ids=lambda n: n.split(".")[0]
)
def test_pipeline_shapes_end_to_end(name):
    """Abstractly trace init + infer at the production geometry."""
    import jax
    import jax.numpy as jnp

    from det3d_tpu.pipeline import Detector

    cfg = load_config(os.path.join(CFG_DIR, name), max_points=120_000)
    if name == "ntusl_10cm.json":
        assert cfg.grid_size[:2] == (1600, 1600)
        assert cfg.feature_map_size[:2] == (800, 800)
        assert cfg.max_voxels == 20000
    det = Detector(cfg)

    v, p, c = cfg.max_voxels, cfg.max_num_points, cfg.num_point_features
    variables = jax.eval_shape(
        lambda r: det.model.init(
            r,
            jnp.zeros((1, v, p, c), jnp.float32),
            jnp.zeros((1, v), jnp.int32),
            jnp.full((1, v, 3), -1, jnp.int32),
            train=False,
        ),
        jax.random.PRNGKey(0),
    )
    dets = jax.eval_shape(
        det.infer,
        variables,
        jax.ShapeDtypeStruct((cfg.max_points, c), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    # post-NMS output budget is config-driven and must be finite/static
    flat = jax.tree.leaves(dets)
    assert all(np.prod(l.shape) < 10**7 for l in flat)
