"""On-chip A/B for the segmented PFN (Config.pfn_segmented).

Measures the full inference pipeline (bench.measure) for each geometry with
the lever off/on, then an output-drift check on 3 production-scale clouds
(detection counts must match; bf16 reassociation score drift reported).

Usage: nohup python tools/pfn_seg_ab.py > /tmp/r5_pfnseg_ab.log 2>&1 &
"""

import json
import sys

sys.path.insert(0, ".")

from bench import measure  # noqa: E402


def drift_check(config_path_off: str, config_path_on: str) -> dict:
    import jax
    import numpy as np

    from det3d_tpu.config import load_config
    from det3d_tpu.data.synthetic import synthetic_cloud
    from det3d_tpu.pipeline import Detector

    cfg_off = load_config(config_path_off, max_points=120_000)
    cfg_on = load_config(config_path_on, max_points=120_000)
    det_off = Detector(cfg_off)
    det_on = Detector(cfg_on)
    v = det_off.init_variables(jax.random.PRNGKey(0))
    out = {"clouds": []}
    for s in range(3):
        pts = synthetic_cloud(cfg_off.max_points, 100_000, seed=100 + s)
        n = np.int32(100_000)
        a = jax.device_get(det_off.infer_jit(v, pts, n))
        b = jax.device_get(det_on.infer_jit(v, pts, n))
        ka = int(np.sum(a.valid))
        kb = int(np.sum(b.valid))
        sa = np.sort(np.asarray(a.scores, np.float32)[np.asarray(a.valid)])[::-1]
        sb = np.sort(np.asarray(b.scores, np.float32)[np.asarray(b.valid)])[::-1]
        k = min(ka, kb)
        sd = float(np.max(np.abs(sa[:k] - sb[:k]))) if k else 0.0
        out["clouds"].append({"n_off": ka, "n_on": kb, "score_drift": sd})
    return out


def main():
    results = {}
    for name, off, on in [
        ("20cm", "configs/ntusl_20cm.json", "/tmp/ntusl_20cm_seg.json"),
        ("10cm", "configs/ntusl_10cm.json", "/tmp/ntusl_10cm_seg.json"),
    ]:
        r_off = measure(off, iters=48)
        print(f"[{name}] OFF: {json.dumps(r_off)}", flush=True)
        r_on = measure(on, iters=48)
        print(f"[{name}] ON : {json.dumps(r_on)}", flush=True)
        results[name] = {"off": r_off, "on": r_on}

    d = drift_check("configs/ntusl_20cm.json", "/tmp/ntusl_20cm_seg.json")
    print(f"[drift 20cm] {json.dumps(d)}", flush=True)
    results["drift_20cm"] = d

    json.dump(results, open("/tmp/r5_pfnseg_ab.json", "w"), indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
