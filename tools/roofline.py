"""Speed-of-light (roofline) analysis of the detection pipeline.

Two views, both per config geometry:

1. Executable totals straight from XLA: `jit(...).lower(...).compile()
   .cost_analysis()` for the two inference dispatches (candidates | NMS
   finalize) and the training step — total FLOPs and HBM bytes of the
   program the compiler actually built. Speed-of-light time is
   max(flops / peak_flops, bytes / hbm_bw); utilization = SOL / measured.

2. An analytic table of the dominant MXU sites (PFN dense, one-hot scatter
   MACs, every RPN conv, matmul-deconvs, head dot) computed from the config
   geometry alone — shows where the FLOPs live and which sites are
   bandwidth- vs compute-bound in isolation.

The analysis runs on whatever backend is active (structure differs slightly
between CPU/TPU compiles — space-to-batch etc. — but FLOP totals are the
same math; run on TPU for exact program parity). Pass measured times from
`tools/trace_pipeline.py` / `tools/trace_train.py` via --measured-* to get
utilization percentages.

TPU v5e peaks (per chip): 197 TF/s bf16 MXU, 819 GB/s HBM.

Usage:
  python tools/roofline.py [--config configs/ntusl_20cm.json]
      [--measured-candidates-ms 5.3] [--measured-finalize-ms 0.7]
      [--measured-train-ms 48.7] [--batch 2]
"""

import argparse
import sys

sys.path.insert(0, ".")

PEAK_BF16_FLOPS = 197e12  # TPU v5e MXU, bf16
PEAK_HBM_BPS = 819e9  # TPU v5e HBM


def _fmt_bytes(b: float) -> str:
    return f"{b / 1e6:.0f} MB" if b < 1e9 else f"{b / 1e9:.2f} GB"


def _sol_ms(flops: float, bytes_: float) -> tuple[float, str]:
    t_mxu = flops / PEAK_BF16_FLOPS
    t_hbm = bytes_ / PEAK_HBM_BPS
    return max(t_mxu, t_hbm) * 1e3, ("MXU" if t_mxu >= t_hbm else "HBM")


def executable_report(name: str, lowered, measured_ms: float | None) -> None:
    """Totals from XLA's static cost model. `flops` is exact for the program
    built; `bytes accessed` counts every instruction's operands and so
    OVERCOUNTS real HBM traffic (fusion keeps most of it in registers/VMEM) —
    it is an upper bound, not a roofline. The flops-only time IS a hard lower
    bound for the MXU."""
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    t_mxu = flops / PEAK_BF16_FLOPS * 1e3
    t_hbm = byts / PEAK_HBM_BPS * 1e3
    line = (
        f"{name:18s} {flops / 1e9:10.1f} GFLOP {_fmt_bytes(byts):>10s}"
        f"   MXU-floor {t_mxu:6.2f} ms   traffic-ceiling {t_hbm:6.2f} ms"
    )
    if measured_ms:
        line += f"   measured {measured_ms:6.2f} ms"
    print(line)


def analytic_table(cfg, batch: int) -> None:
    """Dominant MXU sites from geometry alone (fwd only; bwd ≈ 2x convs)."""
    from det3d_tpu.models.pointpillars import RPN

    nx, ny = int(cfg.grid_size[0]), int(cfg.grid_size[1])
    rpn = RPN()
    rows = []

    # PFN: (P pillars × N pts) decorated 9-feature → Dense(64)
    p, n = cfg.max_voxels, cfg.max_num_points
    rows.append(("PFN dense (PxNx9→64)", 2 * p * n * 9 * 64, p * n * 9 * 2 + p * 64 * 2))

    # one-hot MXU scatter: nrows_pad × CHUNK(128) × 4C MACs (s2d canvas)
    c4 = 4 * 64
    nrows = (nx // 2) * (ny // 2)
    rows.append(
        ("s2d one-hot scatter", 2 * p * 128 * c4, p * c4 * 2 + nrows * c4 * 2)
    )

    # RPN trunk convs on the s2d canvas (H, W = grid/2), NHWC 3x3;
    # the entry conv consumes the 4·64 = 256 s2d-packed channels
    h, w = nx // 2, ny // 2
    hh, ww, ci = h, w, 256
    for bi, (depth, width, ustride, uwidth) in enumerate(
        zip(rpn.layer_nums, rpn.num_filters, rpn.upsample_strides, rpn.num_upsample_filters)
    ):
        # entry (stride 2 except block0 which consumes the s2d canvas at /2)
        stride = 1 if bi == 0 else 2
        hh, ww = hh // stride, ww // stride
        rows.append(
            (
                f"block{bi} entry 3x3 {ci}→{width}",
                2 * hh * ww * ci * width * 9,
                (hh * ww * (ci + width)) * 2,
            )
        )
        for d in range(depth):
            rows.append(
                (
                    f"block{bi} res{d} 3x3 {width}→{width}",
                    2 * hh * ww * width * width * 9,
                    (hh * ww * 2 * width) * 2,
                )
            )
        # matmul-deconv to the common (h, w) map: Dense width → uwidth·u²
        rows.append(
            (
                f"deconv{bi} {width}→{uwidth} (x{ustride})",
                2 * (hh * ww) * width * uwidth * ustride**2,
                (hh * ww * width + hh * ustride * ww * ustride * uwidth) * 2,
            )
        )
        ci = width
    # head: one dot over the 320-ch neck stack → per-anchor channels
    nup = sum(rpn.num_upsample_filters)
    fx, fy = cfg.class_specs[0].feature_map_size[:2]
    nch = 90  # 9 anchors/loc × (1 cls + 7 box + 2 dir) at the ntusl specs
    rows.append(
        ("head dot (nup→90)", 2 * fx * fy * nup * nch, (fx * fy * (nup + nch)) * 2)
    )

    print(f"\n-- analytic MXU sites (batch=1 fwd; train fwd+bwd ≈ 3x convs, ×{batch} batch) --")
    tot_f = tot_b = 0.0
    for name, flops, byts in rows:
        sol, bound = _sol_ms(flops, byts)
        tot_f += flops
        tot_b += byts
        print(
            f"{name:32s} {flops / 1e9:8.1f} GFLOP {_fmt_bytes(byts):>9s}"
            f"  SOL {sol:6.3f} ms ({bound})"
        )
    sol, bound = _sol_ms(tot_f, tot_b)
    print(
        f"{'TOTAL':32s} {tot_f / 1e9:8.1f} GFLOP {_fmt_bytes(tot_b):>9s}"
        f"  SOL {sol:6.3f} ms ({bound})"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ntusl_20cm.json")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--measured-candidates-ms", type=float, default=None)
    ap.add_argument("--measured-finalize-ms", type=float, default=None)
    ap.add_argument("--measured-train-ms", type=float, default=None)
    ap.add_argument("--platform", default=None, help="force backend (e.g. cpu)")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from bench import synthetic_cloud
    from det3d_tpu.config import load_config
    from det3d_tpu.pipeline import Detector

    cfg = load_config(args.config, max_points=120_000)
    if jax.default_backend() != "tpu" and cfg.compute_dtype != "float32":
        cfg = cfg.replace(compute_dtype="float32")  # XLA:CPU lacks bf16 dots
    det = Detector(cfg)
    v = det.init_variables(jax.random.PRNGKey(0))
    cloud = jax.device_put(synthetic_cloud(cfg.max_points, 100_000, seed=0))
    n = jax.device_put(np.int32(100_000))

    print(f"backend: {jax.default_backend()}   config: {args.config}")
    print(f"peaks: {PEAK_BF16_FLOPS / 1e12:.0f} TF/s bf16, {PEAK_HBM_BPS / 1e9:.0f} GB/s HBM\n")
    print("-- XLA cost_analysis per executable --")

    s1 = jax.jit(det.infer_candidates).lower(v, cloud, n)
    executable_report("candidates", s1, args.measured_candidates_ms)
    cands = jax.eval_shape(det.infer_candidates, v, cloud, n)
    s2 = jax.jit(det.postprocess.finalize_stage).lower(cands)
    executable_report("nms finalize", s2, args.measured_finalize_ms)

    if not args.skip_train:
        from det3d_tpu.data.synthetic import sample_scene
        from det3d_tpu.train.trainer import Trainer, host_batch

        tcfg = cfg.replace(batch_size=args.batch)
        trainer = Trainer(tcfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        batch = jax.device_put(
            host_batch(tcfg, [sample_scene(tcfg, rng) for _ in range(args.batch)])
        )
        st = jax.jit(trainer.train_step).lower(state, batch)
        executable_report(f"train step b={args.batch}", st, args.measured_train_ms)

    analytic_table(cfg, args.batch)


if __name__ == "__main__":
    main()
