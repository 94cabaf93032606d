"""AOT export: compile the fused detector once, serialize the artifact.

TPU-native counterpart of the reference's deployment path (reference:
framework/trt_utils.py:6-47 `export_onnx`/`build_engine`/`load_engine`,
train.py:348-424 `trt_export`). The reference exports each network stage to
ONNX and builds per-stage TensorRT FP16 engines with a dynamic-shape profile
for the PFN; on TPU the natural unit is the whole points→detections function:
`jax.export` serializes the StableHLO of the fully fused pipeline (shapes are
already static by design — the pad-to-max contract replaces TRT dynamic
profiles), and weights are saved alongside so the artifact is self-contained.

Artifact layout (`out_dir/`):
    detector.stablehlo   — serialized jax.export artifact of infer(variables, points, n)
    variables.msgpack    — flax-serialized weights
    config.json          — the exact config used (for host pre/post parity)
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from jax import export as jax_export

from det3d_tpu.config import Config
from det3d_tpu.pipeline import Detector


def _config_json(cfg: Config) -> str:
    d = dataclasses.asdict(cfg)
    d["class_specs"] = [dataclasses.asdict(s) for s in cfg.class_specs]
    return json.dumps(d, indent=1)


def export_detector(
    cfg: Config, *, checkpoint: str | None = None, out_dir: str | Path
) -> Path:
    """AOT-export the fused inference function + weights."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    det = Detector(cfg)
    if checkpoint:
        from det3d_tpu.train.checkpoint import load_latest_state

        state = load_latest_state(cfg, checkpoint, det)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        variables = det.init_variables(jax.random.PRNGKey(0))

    pts_spec = jax.ShapeDtypeStruct((cfg.max_points, cfg.num_point_features), jnp.float32)
    n_spec = jax.ShapeDtypeStruct((), jnp.int32)
    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), variables
    )

    exported = jax_export.export(jax.jit(det.infer))(var_specs, pts_spec, n_spec)
    (out / "detector.stablehlo").write_bytes(exported.serialize())

    # also export the two-stage split (candidates | NMS finalize): on TPU
    # the fused graph loses the space-to-batch conv transform to the NMS
    # custom call (~3x on every conv — see pipeline.Detector.infer_jit), so
    # the runtime prefers these when present. This mirrors the reference's
    # multi-engine TRT deployment (train.py:348-424 builds per-stage
    # engines) — staged artifacts, one runtime surface.
    exported_c = jax_export.export(jax.jit(det.infer_candidates))(
        var_specs, pts_spec, n_spec
    )
    cand_specs = jax.eval_shape(det.infer_candidates, var_specs, pts_spec, n_spec)
    exported_f = jax_export.export(jax.jit(det.postprocess.finalize_stage))(cand_specs)
    (out / "candidates.stablehlo").write_bytes(exported_c.serialize())
    (out / "finalize.stablehlo").write_bytes(exported_f.serialize())

    (out / "variables.msgpack").write_bytes(serialization.to_bytes(variables))
    (out / "config.json").write_text(_config_json(cfg))
    print(f"exported detector ({cfg.max_points} pts, platform {exported.platforms}) → {out}")
    return out
