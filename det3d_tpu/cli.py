"""Command-line entry points.

The reference drives everything through editing `train.py`'s `__main__`
(reference train.py:579-583 hard-calls `trt_eval()`); here the five entry
functions are subcommands:

    python -m det3d_tpu.cli train  --config configs/ntusl_20cm.json [--synthetic]
    python -m det3d_tpu.cli infer  --config ... [--checkpoint DIR] [--breakdown]
    python -m det3d_tpu.cli eval   --config ... --dt dt.pkl --gt gt.pkl
    python -m det3d_tpu.cli export --config ... [--checkpoint DIR] --out DIR
    python -m det3d_tpu.cli serve  --config ... [--checkpoint DIR]
    python -m det3d_tpu.cli create-info --root DATA_ROOT [--waymo]
    python -m det3d_tpu.cli bench-rpn --config ...

Mapping to the reference: train→train.py:23, infer→train.py:187 (+ trt_eval
273, which on TPU is `infer --exported`), export→train.py:348 trt_export,
serve→ros_node.py, create-info→create_info.py, bench-rpn→rpn_builder.py.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from det3d_tpu.config import load_config


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="det3d_tpu")
    ap.add_argument(
        "--platform",
        default=None,
        choices=("cpu", "tpu"),
        help="force the jax backend before initialization (a JAX_PLATFORMS "
        "env var cannot override an environment whose site config pins a "
        "platform; this flag can, as long as no backend has initialized yet)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add_common(p):
        p.add_argument("--config", default="configs/ntusl_20cm.json")
        # None sentinel: only override the JSON's max_points when given
        p.add_argument("--max-points", type=int, default=None)
        p.add_argument("--synthetic", action="store_true", help="generated scenes instead of dataset files")

    p = sub.add_parser("train", help="training loop (reference train.py:23)")
    add_common(p)
    p.add_argument("--steps", type=int, default=10_000_000)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--model-dir", default=None)
    p.add_argument("--save-step", type=int, default=5000)
    p.add_argument("--eval-step", type=int, default=5000)
    p.add_argument("--display-step", type=int, default=50)
    p.add_argument("--eval-frames", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=None,
                   help="override the config's learning_rate (the reference "
                   "overrides lr the same way on resume, train.py:76)")
    p.add_argument(
        "--spatial-shards", type=int, default=1,
        help="hybrid DP x SP training: shard each sample's conv activations "
        "spatially over this many devices (devices/spatial_shards become "
        "data-parallel groups); 1 = pure data-parallel",
    )
    p.add_argument(
        "--device-augment", action="store_true",
        help="run the global augmentation transforms (flip/rotate/scale/"
        "translate) on device inside the jitted step; the host dataloader "
        "keeps only the per-object noise",
    )

    p = sub.add_parser("infer", help="offline eval + timing (reference train.py:187)")
    add_common(p)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--exported", default=None, help="run from an AOT-exported artifact dir")
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--batch", type=int, default=1, help="vmapped batch size (amortizes dispatch latency)")
    p.add_argument("--breakdown", action="store_true")
    p.add_argument("--out", default=None)
    p.add_argument(
        "--exact-topk", action="store_true",
        help="exact pre-NMS top-k instead of the TPU-default bucketed "
        "approximation (parity runs / approx-vs-exact mAP A/B)",
    )
    p.add_argument(
        "--spatial", action="store_true",
        help="spatially partition each frame's conv stack over ALL visible "
        "devices (parallel/mesh.make_spatial_infer) — multi-chip single-"
        "frame latency scaling; incompatible with --batch > 1",
    )

    p = sub.add_parser("eval", help="official mAP from pickled annos (reference eval/)")
    add_common(p)
    p.add_argument("--dt", required=True)
    p.add_argument("--gt", required=True)
    p.add_argument("--range", type=float, default=80.0)

    p = sub.add_parser("export", help="AOT-compile + serialize (reference train.py:348 trt_export)")
    add_common(p)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", required=True)

    p = sub.add_parser("serve", help="streaming serving loop (reference ros_node.py)")
    add_common(p)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--hz", type=float, default=10.0)
    p.add_argument(
        "--replay", default=None, metavar="DIR",
        help="replay raw .bin point-cloud files from DIR at --hz through "
        "the C++ async loader instead of the synthetic sensor (the "
        "recorded-drive stand-in for the reference's live ROS feed)",
    )
    p.add_argument(
        "--loop", action="store_true",
        help="with --replay: cycle the directory until --frames served",
    )
    p.add_argument(
        "--spatial", action="store_true",
        help="serve each frame spatially partitioned over all visible "
        "devices (multi-chip serving latency)",
    )

    p = sub.add_parser("view", help="render BEV scene frames (reference viewer.py)")
    add_common(p)
    p.add_argument("--info", default="data_info.pkl")
    p.add_argument("--dt", default=None)
    p.add_argument("--frames", default="0:1", help="start:stop frame slice")
    p.add_argument("--out", default="shots/")
    p.add_argument("--anchors", action="store_true")
    p.add_argument("--voxels", action="store_true")
    p.add_argument(
        "--mode", choices=("bev", "3d"), default="bev",
        help="3d: software-projected orbit-camera scene renders (the "
        "headless stand-in for the reference's GL scene navigation, "
        "viewer/glwidget.py)",
    )
    p.add_argument("--azimuth", type=float, default=-60.0,
                   help="3d camera azimuth in degrees")
    p.add_argument("--elevation", type=float, default=35.0)
    p.add_argument("--distance", type=float, default=90.0)
    p.add_argument("--orbit", type=int, default=0, metavar="N",
                   help="with --mode 3d: render an N-view azimuth sweep per "
                   "frame (turntable) instead of the single --azimuth view")
    p.add_argument(
        "--image", action="store_true",
        help="also render the camera-image panel with projected 3D boxes "
        "(requires img_path + calib in the info)",
    )
    p.add_argument(
        "--interactive", action="store_true",
        help="open a keyboard-driven viewer window instead of batch export "
        "(←/→ frames, a anchors, v voxels, s screenshot, q quit; needs a "
        "GUI matplotlib backend)",
    )

    p = sub.add_parser(
        "import-weights",
        help="convert a reference PyTorch .pth checkpoint (train.py:117-127 "
        "layout) into a framework checkpoint dir usable by infer/serve/export",
    )
    add_common(p)
    p.add_argument("--torch-ckpt", required=True, help="reference .pth file")
    p.add_argument("--out", required=True, help="framework model_dir to write")
    p.add_argument(
        "--no-optimizer", action="store_true",
        help="skip the Adam-moment transfer (re-warm the optimizer from "
        "zero instead of resuming mid-trajectory)",
    )

    p = sub.add_parser(
        "export-weights",
        help="eject a framework checkpoint as a reference-layout .pth "
        "(inverse of import-weights; loads with strict=True in the reference)",
    )
    add_common(p)
    p.add_argument("--checkpoint", required=True, help="framework model_dir")
    p.add_argument("--out", required=True, help=".pth file to write")

    p = sub.add_parser("create-info", help="dataset indexer (reference create_info.py)")
    p.add_argument("--root", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--waymo", action="store_true")
    p.add_argument("--num-features", type=int, default=4)

    p = sub.add_parser("bench-rpn", help="RPN microbenchmark (reference rpn_builder.py)")
    add_common(p)
    p.add_argument("--iters", type=int, default=100)

    p = sub.add_parser(
        "tune",
        help="A/B the config-gated perf levers on the live backend and write "
        "a tuned config (TPU-native analogue of TensorRT's build-time tactic "
        "tuning, reference rpn_builder.py:108-130)",
    )
    add_common(p)
    p.add_argument("--out", default=None, help="tuned JSON path (default: <config>_tuned.json)")
    p.add_argument("--mode", choices=("infer", "train", "both"), default="both")
    p.add_argument("--iters", type=int, default=32, help="inference window length")
    p.add_argument("--train-iters", type=int, default=12)
    p.add_argument("--batch-size", type=int, default=2, help="train-step batch")
    p.add_argument("--margin", type=float, default=0.02,
                   help="relative win required to adopt a lever flip")
    p.add_argument("--levers", default=None,
                   help="comma-separated lever subset (default: all)")
    p.add_argument("--report", default=None, help="also dump the trial report as JSON")

    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.cmd == "create-info":
        from det3d_tpu.data.create_info import create_info

        create_info(args.root, out_path=args.out, waymo=args.waymo, num_features=args.num_features)
        return

    overrides = {} if args.max_points is None else {"max_points": args.max_points}
    cfg = load_config(args.config, **overrides)

    if (
        args.cmd in ("train", "infer", "serve", "bench-rpn", "tune")
        and str(cfg.compute_dtype) in ("bfloat16", "bf16")
    ):
        import jax

        if jax.default_backend() == "cpu":
            # XLA:CPU's thunk runtime has no bf16 dot (`DotThunk: BF16 x
            # BF16 = F32 UNIMPLEMENTED`). Every command that EXECUTES the
            # model hits one (train: PFN-dense wgrad; infer/serve: the
            # head's bf16 dot with f32 accumulation) — promote on the CPU
            # debug backend. `export` keeps the configured dtype: it only
            # serializes, and the artifact's dtype is a deployment choice.
            print(f"{args.cmd} on cpu backend: promoting compute_dtype "
                  "bfloat16 -> float32 (XLA:CPU has no bf16 dot kernel)")
            cfg = cfg.replace(compute_dtype="float32")

    if args.cmd == "train":
        if args.batch_size:
            cfg = cfg.replace(batch_size=args.batch_size)
        if args.lr is not None:
            cfg = cfg.replace(learning_rate=args.lr)
        from det3d_tpu.apps.train_app import train

        train(
            cfg,
            max_steps=args.steps,
            display_step=args.display_step,
            save_step=args.save_step,
            eval_step=args.eval_step,
            eval_frames=args.eval_frames,
            synthetic=args.synthetic,
            model_dir=args.model_dir,
            seed=args.seed,
            spatial_shards=args.spatial_shards,
            device_augment=args.device_augment,
        )
    elif args.cmd == "infer":
        if args.exported:
            from det3d_tpu.deploy.runtime import infer_exported

            infer_exported(
                cfg, args.exported, synthetic=args.synthetic, num_frames=args.frames
            )
        else:
            from det3d_tpu.apps.infer_app import infer

            infer(
                cfg,
                checkpoint=args.checkpoint,
                synthetic=args.synthetic,
                num_frames=args.frames,
                breakdown=args.breakdown,
                out_path=args.out,
                batch=args.batch,
                exact_topk=args.exact_topk,
                spatial=args.spatial,
            )
    elif args.cmd == "eval":
        import pickle

        from det3d_tpu.eval.ap import get_official_eval_result

        with open(args.dt, "rb") as f:
            dt_annos = pickle.load(f)
        with open(args.gt, "rb") as f:
            gt_annos = pickle.load(f)
        _, s = get_official_eval_result(gt_annos, dt_annos, list(cfg.detect_class), args.range)
        print(s)
    elif args.cmd == "view":
        from det3d_tpu.viewer.app import SceneViewer

        viewer = SceneViewer(cfg, info_path=args.info, dt_path=args.dt)
        start, stop = (int(v) for v in args.frames.split(":"))
        if args.interactive:
            if args.mode == "3d" or args.orbit:
                raise SystemExit(
                    "view --interactive is BEV-only; --mode 3d/--orbit are "
                    "batch-export options (drop --interactive to use them)"
                )
            from det3d_tpu.viewer.app import InteractiveViewer

            InteractiveViewer(viewer, start=start, out_dir=args.out).run()
        else:
            camera = None
            if args.mode == "3d":
                from det3d_tpu.viewer.render3d import OrbitCamera

                camera = OrbitCamera(args.azimuth, args.elevation, args.distance)
            paths = viewer.export_frames(
                range(start, min(stop, len(viewer))), args.out,
                show_anchors=args.anchors, show_voxels=args.voxels, image=args.image,
                mode=args.mode, camera=camera, orbit=args.orbit,
            )
            print(f"wrote {len(paths)} frames → {args.out}")
    elif args.cmd == "export":
        from det3d_tpu.deploy.export import export_detector

        export_detector(cfg, checkpoint=args.checkpoint, out_dir=args.out)
    elif args.cmd == "serve":
        if args.replay:
            from det3d_tpu.apps.serve_app import serve_replay

            serve_replay(
                cfg, args.replay, checkpoint=args.checkpoint, hz=args.hz,
                frames=args.frames, loop=args.loop, spatial=args.spatial,
            )
        else:
            from det3d_tpu.apps.serve_app import serve_synthetic

            serve_synthetic(
                cfg, checkpoint=args.checkpoint, frames=args.frames, hz=args.hz,
                spatial=args.spatial,
            )
    elif args.cmd == "bench-rpn":
        from det3d_tpu.deploy.rpn_bench import bench_rpn

        bench_rpn(cfg, iters=args.iters)
    elif args.cmd == "import-weights":
        from det3d_tpu.deploy.torch_interop import import_torch_checkpoint

        step = import_torch_checkpoint(
            args.torch_ckpt, cfg, args.out, import_optimizer=not args.no_optimizer
        )
        print(f"imported step {step}: {args.torch_ckpt} -> {args.out} "
              "(restore with --checkpoint)")
    elif args.cmd == "export-weights":
        from det3d_tpu.deploy.torch_interop import export_torch_checkpoint

        step = export_torch_checkpoint(args.checkpoint, cfg, args.out)
        print(f"exported step {step}: {args.checkpoint} -> {args.out} "
              "(reference-layout .pth)")
    elif args.cmd == "tune":
        import jax

        # each lever flip recompiles; the persistent cache makes re-tunes
        # cheap. TPU only: XLA:CPU AOT artifacts are keyed by compile-machine
        # features and loading another host's triggers SIGILL hazards
        # (same reason __graft_entry__ uses a throwaway CPU cache dir).
        if jax.default_backend() == "tpu":
            try:
                jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
            except Exception:
                pass
        from det3d_tpu.tune import tune

        report = tune(
            args.config,
            out_path=args.out,
            mode=args.mode,
            infer_iters=args.iters,
            train_iters=args.train_iters,
            batch_size=args.batch_size,
            margin=args.margin,
            only_levers=tuple(args.levers.split(",")) if args.levers else None,
            config_overrides=overrides,  # honors --max-points
        )
        if args.report:
            import json as _json

            Path(args.report).write_text(_json.dumps(report, indent=1) + "\n")


if __name__ == "__main__":
    main()
