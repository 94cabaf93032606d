"""Config autotuner: measure the config-gated perf levers on the live
backend and write a tuned config JSON.

The framework carries levers whose best setting is hardware- and
geometry-dependent (every measured fact in BASELINE.md says so: w-parity
packing wins everywhere so far, the s2b fence wins in training but loses at
batch-1 inference, split-head is geometry-dependent — the one recorded 10 cm
loss, 23.22→23.56 ms, predates the spatial-preds contract, and the current
19.65 ms 10 cm baseline was measured with split-head ON):

  inference-path levers (measured on the fused pipeline):
    pack_w          w-parity packed block0 (column parity folded weight-side)
    fuse_in_stats   upsample-branch Gram IN statistics
    block0_blocked  blocked-halo canvas + batch-over-blocks block0
    split_head      per-parity neck emission + two half-width head dots
  train-path levers (measured on the optimizer step):
    pack_w          (same packing under the training graph)
    block0_blocked_train  blocked-halo block0 under the train step (batch-
                    (B·nblk) conv emitters instead of the slow batch-B ones)
    late_blocked_train    blocks 1-2 batch-over-blocks under the train step
                    (fresh 5-row halos per block; same emitter physics)

(Round-3 carried three more levers — scatter_subtile, matcher_skip,
fused_adam — and round 4 a fourth, pfn_segmented; all were measured
on-chip as regressions or no-wins and their surfaces deleted —
BASELINE.md "Round-3 final lever A/Bs" / "segmented PFN".)

All candidates are SEMANTICS-PRESERVING — each lever has an elementwise
equality or golden test in tests/ — so tuning is purely a wall-clock
decision.

Greedy protocol per mode: measure the current config, then flip one lever
at a time (carrying previous winners) and keep a flip only when it beats
the incumbent best window by `margin` (relay noise on the axon dev tunnel
is ±3 ms on ~50-frame windows; the default 2% margin rejects noise wins).
Timing methodology matches bench.py: distinct inputs cycled (the relay
dedupes repeat executions on identical buffers), enqueue-all/sync-once
windows, best of 3.

Each flip is a fresh compile: on a cold TPU cache that is 5-20 min per
variant through the remote AOT helper — run with
JAX_COMPILATION_CACHE_DIR=/root/.jax_cache (the CLI sets it up), and
expect the first tune of a geometry to be slow and later ones cheap.

The reference has no counterpart (its TensorRT builder auto-tunes tactics
per engine at build time — rpn_builder.py:108-130 is the closest artifact);
this is the TPU-native equivalent: the compiler owns op scheduling, the
framework owns algorithm-level variants, and `tune` picks between them on
the actual hardware.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from det3d_tpu.config import Config, load_config

# (lever, candidates, modes-it-affects, needs_tpu)
LEVERS = (
    ("pack_w", (True, False), ("infer", "train"), False),
    ("fuse_in_stats", (True, False), ("infer",), False),
    ("block0_blocked", (False, True), ("infer",), True),
    ("block0_blocked_train", (False, True), ("train",), True),
    ("late_blocked_train", (False, True), ("train",), True),
    ("split_head", (True, False), ("infer",), False),
)


def _infer_inputs(cfg: Config, num_clouds: int = 6):
    """Distinct clouds (the relay dedupes identical buffers) with bench.py's
    EXACT workload recipe — the scatter levers' wins are pillar-occupancy-
    dependent, so tuning on a lighter cloud would pick wrong."""
    from det3d_tpu.data.synthetic import synthetic_cloud

    n = min(100_000, cfg.max_points)
    clouds = [synthetic_cloud(cfg.max_points, n, seed=s) for s in range(num_clouds)]
    return clouds, n


def measure_infer(cfg: Config, iters: int, windows: int = 3) -> float:
    """Pipelined ms/frame on the fused inference pipeline, best window."""
    import jax

    from det3d_tpu.pipeline import Detector

    det = Detector(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    host_clouds, n_pts = _infer_inputs(cfg)
    clouds = [jax.device_put(c) for c in host_clouds]
    n = jax.device_put(np.int32(n_pts))

    fn = det.infer_jit
    jax.block_until_ready(fn(variables, clouds[0], n))  # compile
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        outs = [fn(variables, clouds[i % len(clouds)], n) for i in range(iters)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    return best


def measure_train(cfg: Config, iters: int, windows: int = 2) -> float:
    """Pipelined ms/step on the optimizer step, best window."""
    import jax

    from det3d_tpu.data.synthetic import sample_scene
    from det3d_tpu.train.trainer import Trainer, host_batch

    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batches = [
        jax.device_put(
            host_batch(cfg, [sample_scene(cfg, rng) for _ in range(cfg.batch_size)])
        )
        for _ in range(4)
    ]
    state, loss_dict, _ = trainer.train_step_jit(state, batches[0])  # compile
    jax.block_until_ready(loss_dict)
    best = float("inf")
    for _ in range(windows):
        # the step donates its state input — chain it forward, never reuse
        t0 = time.perf_counter()
        for i in range(iters):
            state, loss_dict, _ = trainer.train_step_jit(state, batches[i % len(batches)])
        jax.block_until_ready(loss_dict)
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    return best


def tune(
    config_path: str,
    out_path: str | None = None,
    mode: str = "both",
    infer_iters: int = 32,
    train_iters: int = 12,
    batch_size: int = 2,
    margin: float = 0.02,
    only_levers: tuple[str, ...] | None = None,
    config_overrides: dict | None = None,
) -> dict:
    """Greedy per-mode lever search; writes the tuned JSON, returns a report.

    A lever shared by both modes is DECIDED by the first mode that measures
    it (inference — the flagship serving path); later modes inherit the
    decision instead of re-measuring, so a flip rejected for inference can
    never sneak into the single tuned config through the train step.
    """
    import jax

    known = {name for name, _, _, _ in LEVERS}
    if only_levers is not None:
        only_levers = tuple(s.strip() for s in only_levers)
        unknown = set(only_levers) - known
        if unknown:
            raise ValueError(f"unknown lever(s) {sorted(unknown)}; known: {sorted(known)}")

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        print(
            f"WARNING: tuning on the '{jax.default_backend()}' backend — lever "
            "winners are BACKEND-LOCAL (e.g. pack_w=False wins on CPU but is "
            "measured 38% slower on TPU). Do not deploy a CPU-tuned config "
            "to TPU; the tuned JSON records the backend in _tuned_on.")
    raw = _loads(config_path)
    # measure the EXACT bench.py workload unless the config or caller says
    # otherwise: bench pins max_points=120k while the schema default is 200k,
    # and the voxelizer's static sort/scan cost scales with the padded buffer
    config_overrides = dict(config_overrides or {})
    if "max_points" not in config_overrides and "max_points" not in raw:
        config_overrides["max_points"] = 120_000
    chosen: dict[str, object] = {}
    decided: set[str] = set()
    report: dict = {"backend": jax.default_backend(), "config": str(config_path),
                    "modes": {}, "chosen": chosen, "skipped": []}

    def build_cfg(extra: dict, train: bool) -> Config:
        cfg = load_config(dict(raw), batch_size=batch_size,
                          **{**(config_overrides or {}), **chosen, **extra})
        if train and cfg.compute_dtype != "float32" and not on_tpu:
            # XLA:CPU has no bf16 dot kernel, which only the TRAIN step hits
            # (cli.py train does the same promotion); inference keeps the
            # configured dtype — it must be timed as deployed
            cfg = cfg.replace(compute_dtype="float32")
        return cfg

    for mode_name, measure, iters in (
        ("infer", lambda e: measure_infer(build_cfg(e, False), infer_iters), infer_iters),
        ("train", lambda e: measure_train(build_cfg(e, True), train_iters), train_iters),
    ):
        if mode not in (mode_name, "both"):
            continue
        trials: list[dict] = []
        best_ms = measure({})
        unit = "ms/frame" if mode_name == "infer" else "ms/step"
        print(f"[{mode_name}] baseline: {best_ms:.2f} {unit}")
        trials.append({"levers": dict(chosen), "ms": round(best_ms, 3)})
        for lever, candidates, lever_modes, needs_tpu in LEVERS:
            if mode_name not in lever_modes:
                continue
            if only_levers is not None and lever not in only_levers:
                continue
            if lever in decided:  # adopted OR rejected by an earlier mode
                continue
            if needs_tpu and not on_tpu:
                if not any(s["lever"] == lever for s in report["skipped"]):
                    report["skipped"].append(
                        {"lever": lever, "reason": "Pallas-path lever, inert on "
                         + jax.default_backend()})
                continue
            decided.add(lever)
            current = getattr(build_cfg({}, mode_name == "train"), lever)
            for cand in candidates:
                if cand == current:
                    continue
                ms = measure({lever: cand})
                trials.append({"levers": {**chosen, lever: cand}, "ms": round(ms, 3)})
                verdict = "keep" if ms < best_ms * (1.0 - margin) else "reject"
                print(f"[{mode_name}] {lever}={cand}: {ms:.2f} {unit} "
                      f"(incumbent {best_ms:.2f}) -> {verdict}")
                if verdict == "keep":
                    best_ms = ms
                    chosen[lever] = cand
        report["modes"][mode_name] = {
            "final_ms": round(best_ms, 3), "unit": unit, "iters": iters,
            "trials": trials}

    # tuned config = original JSON + winning lever values (load_config
    # round-trips every lever key; non-default values only, so the tuned
    # file stays diff-readable against its source)
    tuned = dict(raw)
    tuned.update(chosen)
    tuned["_tuned_on"] = report["backend"]  # provenance; load_config ignores it
    if out_path is None:
        p = Path(config_path)
        out_path = str(p.with_name(p.stem + "_tuned.json"))
    Path(out_path).write_text(json.dumps(tuned, indent=1) + "\n")
    report["out"] = out_path
    print(f"tuned config -> {out_path}  (levers: {chosen or 'all defaults win'})")
    return report


def _loads(path: str) -> dict:
    from det3d_tpu.config import _loads_tolerant

    return _loads_tolerant(Path(path).read_text())
