"""Structural multi-chip scaling evidence: collectives per mesh size.

Real multi-chip timing is out of reach on a 1-chip rig, but WHAT
communication XLA inserts for each mesh is a compile-time fact. This
compiles the three parallel modes at mesh sizes 2/4/8 (virtual CPU devices)
and prints the per-mode collective table recorded in docs/SCALING.md;
tests/test_parallel.py::TestScalingStructure asserts the same shapes.

    /opt/venv/bin/python tools/scaling_evidence.py
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, os.path.join(_HERE, "..", "tests"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _samples(cfg, k, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(k):
        pts = np.concatenate(
            [rng.uniform(-7, 7, (400, 2)), rng.uniform(-2, 6, (400, 1)),
             rng.uniform(0, 1, (400, 1))], 1).astype(np.float32)
        gt = np.array([[0.0, 0.0, -1.5, 4.6, 2.1, 1.8, 0.3]], np.float32)
        out.append({"points": pts, "gt_boxes": gt,
                    "gt_classes": np.array([1], np.int32)})
    return out


def main() -> None:
    import jax.numpy as jnp
    from helpers import small_cfg

    from det3d_tpu.parallel.mesh import (
        batch_sharded,
        collective_counts,
        make_hybrid_mesh,
        make_mesh,
        make_sharded_train_step,
        make_spatial_infer,
        make_spatial_mesh,
        make_spatial_train,
        replicated,
    )
    from det3d_tpu.train.trainer import Trainer, host_batch

    rows = []

    def add(mode, mesh_desc, counts):
        rows.append((mode, mesh_desc, counts))
        print(f"{mode:30s} {mesh_desc:12s} {counts}")

    for n in (2, 4, 8):
        cfg = small_cfg()
        # --- spatial single-frame inference (GSPMD canvas partition) ----
        mesh = make_spatial_mesh(n)
        det_sp, _ = make_spatial_infer(cfg, mesh)
        v = det_sp.init_variables(jax.random.PRNGKey(0))
        pts = np.zeros((cfg.max_points, 4), np.float32)
        rep = replicated(mesh)
        txt = (
            jax.jit(det_sp.infer_candidates, in_shardings=(rep, rep, rep))
            .lower(v, jnp.asarray(pts), jnp.int32(16))
            .compile()
            .as_text()
        )
        add("spatial infer (candidates)", f"sp={n}", collective_counts(txt))

        # --- DP train step (shard_map, explicit pmean/psum) --------------
        cfgb = small_cfg().replace(batch_size=n)
        trainer = Trainer(cfgb)
        batch = host_batch(cfgb, _samples(cfgb, n))
        dmesh = make_mesh(n)
        state = jax.device_put(
            trainer.init_state(jax.random.PRNGKey(0)), replicated(dmesh)
        )
        step = make_sharded_train_step(trainer, dmesh)
        txt = (
            step.lower(state, jax.device_put(batch, batch_sharded(dmesh)))
            .compile()
            .as_text()
        )
        add("DP train step", f"dp={n}", collective_counts(txt))

    # --- hybrid DP x SP train ---------------------------------------------
    for dp, sp in ((2, 2), (2, 4)):
        cfgb = small_cfg().replace(batch_size=2)
        hmesh = make_hybrid_mesh(dp=dp, sp=sp)
        trainer_sp, step_sp = make_spatial_train(cfgb, hmesh)
        state = jax.device_put(
            trainer_sp.init_state(jax.random.PRNGKey(0)), replicated(hmesh)
        )
        batch = jax.device_put(
            host_batch(cfgb, _samples(cfgb, 2)), batch_sharded(hmesh)
        )
        txt = step_sp.lower(state, batch).compile().as_text()
        add("hybrid train step", f"dp={dp} sp={sp}", collective_counts(txt))

    print("\n| Mode | Mesh | Collectives (compiled HLO) |")
    print("|---|---|---|")
    for mode, mesh_desc, counts in rows:
        pretty = ", ".join(f"{k} ×{v}" for k, v in sorted(counts.items())) or "—"
        print(f"| {mode} | {mesh_desc} | {pretty} |")


if __name__ == "__main__":
    main()
