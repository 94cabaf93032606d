"""Deployment runtime: load an exported artifact and serve it.

Counterpart of the reference's engine wrappers + `trt_eval`
(reference: networks/pointpillars_trt.py:10-77, train.py:273-345): where the
reference deserializes three TensorRT engines and splices them around torch
glue, here one `jax.export` artifact contains the whole pipeline; loading it
requires only the config (host-side pad/annos formatting), not the model
code, and `ExportedDetector` exposes the same `detect(points) → annos`
surface as the live `Detector`.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import numpy as np
from flax import serialization
from jax import export as jax_export

from det3d_tpu.config import Config, load_config
from det3d_tpu.postprocess import Detections, to_annos


class ExportedDetector:
    """Runs a serialized detector artifact (see deploy/export.py)."""

    def __init__(self, artifact_dir: str | Path):
        self.dir = Path(artifact_dir)
        # device_put ONCE: msgpack_restore yields host numpy leaves, and jit
        # re-uploads host arguments on EVERY call — measured 424 ms/frame vs
        # 6.0 ms with device-resident weights on the round-5 TPU drive
        # (tools/deploy_drive.py). The reference's engine wrappers hold
        # weights device-side inside the TRT engine for the same reason.
        self.variables = jax.device_put(
            serialization.msgpack_restore(
                (self.dir / "variables.msgpack").read_bytes()
            )
        )
        raw = json.loads((self.dir / "config.json").read_text())
        raw.pop("class_specs", None)
        raw["detection_range"] = raw.pop("detection_range_raw")
        self.cfg: Config = load_config(raw)
        # prefer the two-stage artifacts (candidates | NMS finalize) when the
        # exporter wrote them: the fused graph loses space-to-batch convs to
        # the NMS custom call on TPU (see deploy/export.py); older artifacts
        # without them still load via the fused program
        cand_p = self.dir / "candidates.stablehlo"
        fin_p = self.dir / "finalize.stablehlo"
        if cand_p.exists() and fin_p.exists():
            cand = jax.jit(jax_export.deserialize(cand_p.read_bytes()).call)
            fin = jax.jit(jax_export.deserialize(fin_p.read_bytes()).call)
            self._call = lambda v, p, n: fin(cand(v, p, n))
        else:
            self._call = jax.jit(
                jax_export.deserialize(
                    (self.dir / "detector.stablehlo").read_bytes()
                ).call
            )

    def pad_points(self, points: np.ndarray) -> tuple[np.ndarray, np.int32]:
        n = min(points.shape[0], self.cfg.max_points)
        out = np.zeros((self.cfg.max_points, points.shape[1]), np.float32)
        out[:n] = points[:n]
        return out, np.int32(n)

    def infer(self, points: np.ndarray, num_points) -> Detections:
        out = self._call(self.variables, points, num_points)
        return Detections(*out) if not isinstance(out, Detections) else out

    def detect(self, points: np.ndarray) -> dict:
        padded, n = self.pad_points(points)
        return to_annos(self.cfg, jax.device_get(self.infer(padded, n)))


def infer_exported(
    cfg: Config, artifact_dir: str, *, synthetic: bool = True, num_frames: int = 64
) -> dict:
    """Offline eval driven by the exported artifact (reference trt_eval,
    train.py:273-345)."""
    from det3d_tpu.apps.train_app import _eval_samples
    from det3d_tpu.eval.ap import get_official_eval_result

    runner = ExportedDetector(artifact_dir)
    samples, gt_annos = _eval_samples(cfg, synthetic, num_frames)

    dt_annos, total = [], 0.0
    for i, s in enumerate(samples):
        t0 = time.perf_counter()
        dt_annos.append(runner.detect(s["points"]))
        dt = time.perf_counter() - t0
        if i > 0:
            total += dt
    avg_ms = 1e3 * total / max(len(samples) - 1, 1)
    print(f"exported-artifact avg: {avg_ms:.2f} ms/frame")
    _, eval_str = get_official_eval_result(gt_annos, dt_annos, list(cfg.detect_class), 80.0)
    print(eval_str)
    return {"dt_annos": dt_annos, "avg_ms": avg_ms, "eval_str": eval_str}
