"""Cross-framework parity vs the ACTUAL reference model and loss.

These tests import the reference's trainable torch modules read-only from
/root/reference (networks/pointpillars8_shared.py:11-382 and
framework/loss_generator.py:26-72), transplant one randomly-initialized
parameter set into the Flax model, and assert the cls/box/dir predictions
(and every loss component) match on identical voxel/coords inputs.

This converts "architecture parity" from a claim backed by self-written
numpy oracles into a measurement against the reference itself.

Intentional divergences, gated off here:
  * PFN BatchNorm statistics: the Flax model computes batch stats over valid
    point slots only, the reference's BatchNorm1d averages zeroed padding
    slots too. The eval-mode test uses running stats (identical semantics);
    the train-mode test fills every pillar to capacity so the two statistics
    coincide.
  * compute dtype: the Flax model defaults to bfloat16; parity runs use
    compute_dtype="float32" (the supported parity configuration).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from det3d_tpu.config import load_config  # noqa: E402
from det3d_tpu.models.pointpillars import PointPillars  # noqa: E402

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference's torch modules (read-only)."""
    sys.path.insert(0, REF_ROOT)
    try:
        import framework.loss_generator as ref_loss  # noqa: F401
        import networks.pointpillars8_shared as ref_net  # noqa: F401
    except Exception as e:  # pragma: no cover - environment without reference
        pytest.skip(f"reference not importable: {e}")
    finally:
        sys.path.remove(REF_ROOT)
    # the reference forward calls torch.cuda.synchronize() unconditionally
    # (networks/pointpillars8_shared.py:365) — no-op it for CPU torch
    torch.cuda.synchronize = lambda *a, **k: None
    return ref_net, ref_loss


def _small_parity_cfg():
    """Small grid, full 9-anchor class specs (the reference SharedHead is
    hard-coded to 9 anchors/loc), float32 compute."""
    return load_config(
        {
            "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
            "center_limit": [-16.0, -16.0, -10.0, 16.0, 16.0, 10.0],
            "voxel_size": [1.0, 1.0, 11.0],
            "max_voxels": 48,
            "max_num_points": 5,
            "max_points": 2048,
            "compute_dtype": "float32",
        }
    )


def _make_torch_model(ref_net, cfg, seed=0):
    torch.manual_seed(seed)
    config = {
        "device": torch.device("cpu"),
        "num_point_features": 4,
        "voxel_size": list(cfg.voxel_size),
        "detection_offset": list(cfg.detection_offset),
        "batch_size": 1,
        "grid_size": list(cfg.grid_size),
    }
    net = ref_net.PointPillars(config)
    # randomize BN affine + running stats so eval-mode parity is non-trivial
    bn = net.pillar_point_net.pfn_layers[1]
    with torch.no_grad():
        bn.weight.copy_(torch.rand(64) * 0.5 + 0.75)
        bn.bias.copy_(torch.randn(64) * 0.1)
        bn.running_mean.copy_(torch.randn(64) * 0.1)
        bn.running_var.copy_(torch.rand(64) * 0.5 + 0.75)
    return net


def _transplant(net) -> dict:
    """Copy the torch reference parameters into the Flax variables tree via
    the PRODUCT converter (deploy/torch_interop.py — the `cli import-weights`
    path), so every parity assertion below also validates the migration tool.

    copy semantics: state_dict_to_variables deep-copies into numpy, so
    torch's in-place running-stat updates during a later net(example) cannot
    mutate the transplanted arrays."""
    from det3d_tpu.deploy.torch_interop import state_dict_to_variables

    v = state_dict_to_variables({k: t.detach() for k, t in net.state_dict().items()})
    return jax.tree.map(jnp.asarray, v)


def _make_inputs(cfg, n_valid=40, full=False, seed=1):
    """Random pillars on unique cells. Returns (torch example, flax args)."""
    rng = np.random.RandomState(seed)
    nx, ny = cfg.grid_size[0], cfg.grid_size[1]
    p = cfg.max_num_points
    cells = rng.choice(nx * ny, size=n_valid, replace=False)
    coords = np.stack([cells // ny, cells % ny], axis=1).astype(np.int32)
    counts = (
        np.full(n_valid, p, np.int32)
        if full
        else rng.randint(1, p + 1, n_valid).astype(np.int32)
    )
    voxels = np.zeros((n_valid, p, 4), np.float32)
    for i in range(n_valid):
        c = counts[i]
        base = (coords[i] + 0.5) * np.array(cfg.voxel_size[:2]) + np.array(
            cfg.detection_offset[:2]
        )
        voxels[i, :c, :2] = base + rng.uniform(-0.5, 0.5, (c, 2))
        voxels[i, :c, 2] = rng.uniform(-1.0, 2.0, c)
        voxels[i, :c, 3] = rng.uniform(0.0, 1.0, c)

    example_t = {
        "voxels": torch.from_numpy(voxels),
        "num_points_per_voxel": torch.from_numpy(counts),
        "coordinates": torch.from_numpy(coords),
    }

    v = cfg.max_voxels if not full else n_valid
    fx_voxels = np.zeros((1, v, p, 4), np.float32)
    fx_voxels[0, :n_valid] = voxels
    fx_counts = np.zeros((1, v), np.int32)
    fx_counts[0, :n_valid] = counts
    fx_coords = np.full((1, v, 3), -1, np.int32)
    fx_coords[0, :n_valid, :2] = coords
    fx_coords[0, :n_valid, 2] = 0
    return example_t, (
        jnp.asarray(fx_voxels),
        jnp.asarray(fx_counts),
        jnp.asarray(fx_coords),
    )


# the repo's flat anchor order is the reference's own anchor-major ordering
# (a·HW + loc), so prediction tensors compare directly after moving k-major


class TestModelParity:
    @pytest.mark.parametrize("train_mode", [False, True])
    def test_weights_transplant_forward(self, ref, train_mode):
        ref_net, _ = ref
        cfg = _small_parity_cfg()
        net = _make_torch_model(ref_net, cfg)
        variables = _transplant(net)
        # train mode: fill every pillar to capacity and size the buffer to
        # the valid count so masked vs unmasked BN statistics coincide
        example_t, fx_args = _make_inputs(cfg, n_valid=40, full=train_mode)

        if train_mode:
            net.train()
        else:
            net.eval()
        with torch.no_grad():
            ref_out = net(example_t)

        model = PointPillars(cfg)
        if train_mode:
            out, _ = model.apply(
                variables, *fx_args, train=True, mutable=["batch_stats"]
            )
        else:
            out = model.apply(variables, *fx_args, train=False)

        for key, k in (("cls_preds", 1), ("box_preds", 7), ("dir_preds", 2)):
            ref_v = ref_out[key].numpy()
            # model contract is spatial channel-major (N, k, nch, fx, fy) —
            # on the packed inference path a per-column-parity PAIR of
            # (…, fy/2) maps. Interleave if split, then row-major flatten of
            # (nch, fx, fy) is the reference's flat anchor order; move k
            # minor to match the reference's (N, A, k)
            got = out[key]
            if isinstance(got, tuple):
                g0, g1 = (np.asarray(g, np.float32) for g in got)
                merged = np.empty(g0.shape[:-1] + (g0.shape[-1] * 2,), g0.dtype)
                merged[..., 0::2] = g0
                merged[..., 1::2] = g1
                got = merged
            else:
                got = np.asarray(got, np.float32)
            got = got.reshape(got.shape[0], k, -1).transpose(0, 2, 1)
            np.testing.assert_allclose(got, ref_v, atol=2e-4, rtol=1e-4)

    def test_import_weights_checkpoint_roundtrip(self, ref, tmp_path):
        """`cli import-weights` path end-to-end: a reference-layout .pth
        (train.py:117-127 dict) converts into a framework checkpoint that
        restores bit-identical to the direct in-memory transplant."""
        ref_net, _ = ref
        cfg = _small_parity_cfg()
        net = _make_torch_model(ref_net, cfg, seed=7)
        pth = tmp_path / "latest.pth"
        torch.save(
            {"step": 1234, "model_state_dict": net.state_dict(),
             "optimizer_state_dict": {}},
            pth,
        )

        from det3d_tpu.deploy.torch_interop import import_torch_checkpoint
        from det3d_tpu.train.checkpoint import CheckpointManager
        from det3d_tpu.train.trainer import Trainer

        step = import_torch_checkpoint(pth, cfg, tmp_path / "model")
        assert step == 1234

        tr = Trainer(cfg)
        template = tr.init_state(jax.random.PRNGKey(1))
        state = CheckpointManager(tmp_path / "model").restore_latest(template)
        assert int(state.step) == 1234
        want = _transplant(net)
        for got, exp in zip(
            jax.tree.leaves({"p": state.params, "b": state.batch_stats}),
            jax.tree.leaves({"p": want["params"], "b": want["batch_stats"]}),
        ):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))

    def test_export_import_roundtrip_identity(self, ref):
        """variables → reference state_dict → variables is the identity
        (every kernel transform inverts exactly), and the exported key set
        loads into the real torch net with strict=True."""
        ref_net, _ = ref
        cfg = _small_parity_cfg()
        net = _make_torch_model(ref_net, cfg, seed=11)
        variables = _transplant(net)

        from det3d_tpu.deploy.torch_interop import (
            state_dict_to_variables,
            variables_to_state_dict,
        )

        np_vars = jax.tree.map(np.asarray, variables)
        sd = variables_to_state_dict(np_vars)
        net2 = _make_torch_model(ref_net, cfg, seed=12)
        net2.load_state_dict(
            {k: torch.from_numpy(v).to(net2.state_dict()[k].dtype) for k, v in sd.items()},
            strict=True,
        )
        back = state_dict_to_variables(sd)
        for got, exp in zip(jax.tree.leaves(back), jax.tree.leaves(np_vars)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))

    def test_export_weights_checkpoint(self, ref, tmp_path):
        """`cli export-weights` path: framework checkpoint dir → .pth whose
        re-import restores identical parameters, and whose
        optimizer_state_dict LOADS into a fresh torch Adam (the reference's
        resume calls load_state_dict on it unconditionally, train.py:70-72)."""
        ref_net, _ = ref
        cfg = _small_parity_cfg()
        net = _make_torch_model(ref_net, cfg, seed=13)
        pth_in = tmp_path / "in.pth"
        torch.save({"step": 42, "model_state_dict": net.state_dict()}, pth_in)

        from det3d_tpu.deploy.torch_interop import (
            export_torch_checkpoint,
            import_torch_checkpoint,
            load_reference_checkpoint,
            state_dict_to_variables,
        )

        import_torch_checkpoint(pth_in, cfg, tmp_path / "model")
        step = export_torch_checkpoint(tmp_path / "model", cfg, tmp_path / "out.pth")
        assert step == 42
        full = torch.load(tmp_path / "out.pth", map_location="cpu", weights_only=True)
        # the reference resume path must accept the optimizer dict as-is
        net2 = _make_torch_model(ref_net, cfg, seed=14)
        net2.load_state_dict(full["model_state_dict"], strict=True)
        torch.optim.Adam(net2.parameters(), lr=1e-3).load_state_dict(
            full["optimizer_state_dict"]
        )
        sd_out, step_out, opt_out = load_reference_checkpoint(tmp_path / "out.pth")
        assert step_out == 42 and opt_out is None  # fresh Adam: empty state
        a = state_dict_to_variables({k: t for k, t in sd_out.items()})
        b = state_dict_to_variables({k: t.detach() for k, t in net.state_dict().items()})
        for got, exp in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))

    def test_optimizer_state_roundtrips_through_export(self, ref, tmp_path):
        """Stepped Adam moments survive torch → framework → torch: exporting
        an imported 3-step checkpoint reproduces each parameter's exp_avg /
        exp_avg_sq and step under torch's own parameter indexing."""
        ref_net, _ = ref
        cfg = _small_parity_cfg()
        net = _make_torch_model(ref_net, cfg, seed=31)
        tparams = list(net.parameters())
        topt = torch.optim.Adam(tparams, lr=7e-4)
        for s in range(3):
            g = torch.Generator().manual_seed(100 + s)
            topt.zero_grad()
            for p in tparams:
                p.grad = torch.randn(p.shape, generator=g) * 0.02
            topt.step()
        pth = tmp_path / "in.pth"
        torch.save(
            {"step": 3, "model_state_dict": net.state_dict(),
             "optimizer_state_dict": topt.state_dict()},
            pth,
        )

        from det3d_tpu.deploy.torch_interop import (
            export_torch_checkpoint,
            import_torch_checkpoint,
        )

        import_torch_checkpoint(pth, cfg, tmp_path / "model")
        export_torch_checkpoint(tmp_path / "model", cfg, tmp_path / "out.pth")
        out = torch.load(tmp_path / "out.pth", map_location="cpu", weights_only=True)
        want = topt.state_dict()
        got = out["optimizer_state_dict"]
        assert list(got["state"].keys()) == list(want["state"].keys())
        for idx, w in want["state"].items():
            gm = got["state"][idx]
            assert int(gm["step"]) == int(w["step"]) == 3
            np.testing.assert_allclose(
                gm["exp_avg"].numpy(), w["exp_avg"].numpy(), rtol=1e-6, atol=1e-8
            )
            np.testing.assert_allclose(
                gm["exp_avg_sq"].numpy(), w["exp_avg_sq"].numpy(), rtol=1e-6, atol=1e-8
            )
        # and torch accepts it for resume
        net2 = _make_torch_model(ref_net, cfg, seed=32)
        net2.load_state_dict(out["model_state_dict"], strict=True)
        torch.optim.Adam(net2.parameters(), lr=7e-4).load_state_dict(got)

    def test_import_optimizer_state_resumes_adam(self, ref, tmp_path):
        """A migrated run resumes MID-TRAJECTORY: after importing a .pth with
        3 steps of torch Adam state, our very next optimizer step (the
        trainer's clip+Adam chain) produces the same
        parameters as torch's 4th step — moments, bias-correction count, and
        layout transforms all have to line up for this to hold."""
        import optax

        ref_net, _ = ref
        lr = 7e-4
        cfg = _small_parity_cfg().replace(learning_rate=lr)
        net = _make_torch_model(ref_net, cfg, seed=21)
        tparams = [p for p in net.parameters()]
        topt = torch.optim.Adam(tparams, lr=lr)

        torch.manual_seed(99)
        param_keys = [
            k for k in net.state_dict()
            if not k.endswith(("running_mean", "running_var", "num_batches_tracked"))
        ]

        def fab_grads(step_seed):
            g = torch.Generator().manual_seed(step_seed)
            return {
                k: torch.randn(net.state_dict()[k].shape, generator=g) * 0.02
                for k in param_keys
            }

        for s in range(3):  # small grads: the 10.0 global-norm clip stays inactive
            grads = fab_grads(s)
            topt.zero_grad()
            for p, k in zip(tparams, param_keys):
                p.grad = grads[k].clone()
            torch.nn.utils.clip_grad_norm_(tparams, 10.0)
            topt.step()

        pth = tmp_path / "latest.pth"
        torch.save(
            {"step": 300, "model_state_dict": net.state_dict(),
             "optimizer_state_dict": topt.state_dict()},
            pth,
        )

        from det3d_tpu.deploy.torch_interop import import_torch_checkpoint
        from det3d_tpu.train.checkpoint import CheckpointManager
        from det3d_tpu.train.trainer import Trainer

        import_torch_checkpoint(pth, cfg, tmp_path / "model")
        tr = Trainer(cfg)
        state = CheckpointManager(tmp_path / "model").restore_latest(
            tr.init_state(jax.random.PRNGKey(1))
        )

        # step 4 on both sides with identical gradients
        grads4 = fab_grads(3)
        from det3d_tpu.deploy.torch_interop import state_dict_to_variables

        g_tree = state_dict_to_variables(
            {k: grads4.get(k, torch.zeros(net.state_dict()[k].shape))
             for k in net.state_dict()}
        )["params"]
        g_tree = jax.tree.map(lambda t, g: jnp.asarray(g, t.dtype), state.params, g_tree)
        updates, _ = tr.optimizer.update(g_tree, state.opt_state, state.params)
        ours = optax.apply_updates(state.params, updates)

        topt.zero_grad()
        for p, k in zip(tparams, param_keys):
            p.grad = grads4[k].clone()
        torch.nn.utils.clip_grad_norm_(tparams, 10.0)
        topt.step()
        want = _transplant(net)["params"]

        for got, exp in zip(jax.tree.leaves(ours), jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(exp), rtol=1e-5, atol=1e-6
            )

    def test_import_weights_rejects_wrong_config(self, ref, tmp_path):
        """A geometry mismatch must fail loudly at import, not at inference."""
        ref_net, _ = ref
        cfg = _small_parity_cfg()
        net = _make_torch_model(ref_net, cfg)
        pth = tmp_path / "latest.pth"
        torch.save({"step": 1, "model_state_dict": net.state_dict()}, pth)

        from det3d_tpu.deploy.torch_interop import import_torch_checkpoint

        bad_cfg = cfg.replace(num_point_features=5)  # PFN input width differs
        with pytest.raises(ValueError, match="shape mismatch"):
            import_torch_checkpoint(pth, bad_cfg, tmp_path / "model2")

    def test_batch_stats_update_matches_torch(self, ref):
        """Running-stat momentum convention matches BatchNorm1d (full pillars,
        so the masked statistics equal torch's)."""
        ref_net, _ = ref
        cfg = _small_parity_cfg()
        net = _make_torch_model(ref_net, cfg)
        variables = _transplant(net)
        example_t, fx_args = _make_inputs(cfg, n_valid=40, full=True)

        net.train()
        with torch.no_grad():
            net(example_t)
        bn = net.pillar_point_net.pfn_layers[1]

        model = PointPillars(cfg)
        _, updates = model.apply(
            variables, *fx_args, train=True, mutable=["batch_stats"]
        )
        got = updates["batch_stats"]["pfn"]["pfn_bn"]
        np.testing.assert_allclose(
            np.asarray(got["mean"]), bn.running_mean.numpy(), atol=1e-4
        )
        # torch's running_var update stores the UNBIASED batch variance
        # (while normalizing with the biased one); MaskedBatchNorm reproduces
        # both, so trained running stats compare directly
        np.testing.assert_allclose(
            np.asarray(got["var"]), bn.running_var.numpy(), rtol=2e-3
        )


class TestLossParity:
    def test_loss_components_match_reference(self, ref):
        _, ref_loss = ref
        from det3d_tpu.losses import detection_loss

        rng = np.random.RandomState(7)
        b, a = 2, 900
        labels = rng.choice([-1, 0, 1], size=(b, a), p=[0.2, 0.75, 0.05]).astype(
            np.int32
        )
        bbox_targets = rng.randn(b, a, 7).astype(np.float32)
        dir_targets = rng.randint(0, 2, (b, a)).astype(np.int32)
        cls_preds = rng.randn(b, a, 1).astype(np.float32) * 2
        box_preds = rng.randn(b, a, 7).astype(np.float32)
        dir_preds = rng.randn(b, a, 2).astype(np.float32)

        gen = ref_loss.LossGenerator(
            {"box_code_size": 7, "device": torch.device("cpu")}
        )
        ref_out = gen.generate(
            {
                "cls_preds": torch.from_numpy(cls_preds),
                "box_preds": torch.from_numpy(box_preds),
                "dir_preds": torch.from_numpy(dir_preds),
            },
            {
                "labels": labels,
                "bbox_targets": bbox_targets,
                "dir_targets": dir_targets,
            },
        )

        got = detection_loss(
            {   # model contract: channel-major (B, k, A)
                "cls_preds": jnp.asarray(cls_preds.transpose(0, 2, 1)),
                "box_preds": jnp.asarray(box_preds.transpose(0, 2, 1)),
                "dir_preds": jnp.asarray(dir_preds.transpose(0, 2, 1)),
            },
            jnp.asarray(labels),
            jnp.asarray(bbox_targets.transpose(0, 2, 1)),  # channel-major
            jnp.asarray(dir_targets),
        )
        for key in ("loss", "cls_loss", "loc_loss", "dir_loss",
                    "cls_pos_loss", "cls_neg_loss"):
            assert np.isclose(
                float(got[key]), float(ref_out[key]), rtol=1e-5, atol=1e-6
            ), f"{key}: {float(got[key])} vs {float(ref_out[key])}"


class TestPipelineParity:
    """End-to-end POST-PROCESSING parity vs the reference's actual
    `Inference.infer_gpu` (framework/inference.py:26-138), run on torch-CPU
    at the full production anchor scale (1.44 M anchors, the hard-coded
    400x400 feature maps of framework/anchor_assigner.py:224-245).

    Identical fabricated predictions + anchor mask go through BOTH
    pipelines: the reference's mask-gather → sigmoid → gate → topk →
    numpy decode → NMS → dir flip → range filter → annos, and this repo's
    masked-dense logit-space postprocessor (postprocess.make_postprocessor
    + to_annos). The reference's CUDA NMS kernel cannot launch here, so
    `nms_gpu` is substituted with the sequential numpy oracle implementing
    the same bitmask-greedy semantics incl. the +1 pixel-convention IoU
    (tests/np_ref.nms_greedy_ref ↔ framework/nms.py:85-150); everything
    else on the reference side is the reference's own code. Anchor
    construction equality (ours vs framework.anchor_assigner) is asserted
    in passing."""

    @pytest.fixture()
    def ref_pipeline(self, monkeypatch):
        # the reference uses numpy aliases removed in numpy>=1.24
        for name, val in (("bool", bool), ("float", float), ("int", int)):
            if not hasattr(np, name):
                monkeypatch.setattr(np, name, val, raising=False)
        # numpy<1.16 meshgrid returned a list; the reference concatenates
        # `locations + [size, rotation]` (anchor_assigner.py:318)
        _orig_meshgrid = np.meshgrid
        monkeypatch.setattr(
            np, "meshgrid", lambda *a, **k: list(_orig_meshgrid(*a, **k))
        )
        # numba is not installed here: stub it so the reference modules
        # import, with @jit/@njit as identity decorators — the jitted
        # functions run as the same plain-Python/numpy code they decorate,
        # so reference SEMANTICS are preserved (only speed is lost). The
        # cuda kernels never run (nms_gpu is oracle-substituted below).
        import types

        def _identity_jit(*a, **k):
            if a and callable(a[0]):
                return a[0]
            return lambda f: f

        fake_cuda = types.ModuleType("numba.cuda")
        fake_cuda.jit = _identity_jit
        fake_cuda.to_device = lambda x, *a, **k: x
        fake_cuda.select_device = lambda *a, **k: None
        fake_cuda.stream = lambda: None
        fake_numba = types.ModuleType("numba")
        fake_numba.jit = _identity_jit
        fake_numba.njit = _identity_jit
        fake_numba.prange = range
        fake_numba.cuda = fake_cuda
        monkeypatch.setitem(sys.modules, "numba", fake_numba)
        monkeypatch.setitem(sys.modules, "numba.cuda", fake_cuda)

        sys.path.insert(0, REF_ROOT)
        try:
            import framework.anchor_assigner as ref_aa
            import framework.inference as ref_inf
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference not importable: {e}")
        finally:
            sys.path.remove(REF_ROOT)

        # AnchorAssigner.__init__ calls get_anchor_coor over all 1.44 M
        # anchors only to fill the (unused here) CUDA upload buffer; as
        # stubbed pure Python that is ~40 s per test. Same math, vectorized:
        def _fast_anchor_coor(anchors_bv, stride, offset, grid_size):
            mn = np.floor((anchors_bv[:, :2] - offset[:2]) / stride[:2])
            mx = np.floor((anchors_bv[:, 2:4] - offset[:2]) / stride[:2])
            ret = np.concatenate(
                [
                    np.maximum(mn, 0),
                    np.minimum(mx, [grid_size[0] - 1, grid_size[1] - 1]),
                ],
                axis=1,
            )
            return ret.astype(np.int32)

        monkeypatch.setattr(
            ref_aa.box_np_ops, "get_anchor_coor", _fast_anchor_coor
        )
        from tests.np_ref import nms_greedy_ref

        monkeypatch.setattr(
            ref_inf,
            "nms_gpu",
            lambda dets, thr: nms_greedy_ref(
                dets[:, :4], dets[:, 4], thr, post_max_size=len(dets)
            ),
        )
        # infer_gpu calls torch.cuda.synchronize() unconditionally
        # (inference.py:37 etc.) — no-op on CPU torch
        monkeypatch.setattr(torch.cuda, "synchronize", lambda *a, **k: None)
        return ref_aa, ref_inf

    def test_postprocess_pipeline_matches_reference(self, ref_pipeline):
        ref_aa, ref_inf = ref_pipeline
        import torch

        from det3d_tpu.anchors import build_anchors
        from det3d_tpu.postprocess import make_postprocessor, to_annos

        cfg = load_config("configs/ntusl_20cm.json", max_points=1000)
        aset = build_anchors(cfg)

        ref_config = {
            "detection_offset": np.asarray(cfg.detection_offset, np.float32),
            "detection_range_diff": np.asarray(
                cfg.detection_range_diff, np.float32
            ),
            "grid_size": np.asarray(cfg.grid_size, np.int64),
            "voxel_size": np.asarray(cfg.voxel_size, np.float32),
            "box_code_size": cfg.box_code_size,
            "device": torch.device("cpu"),
            "center_limit": np.asarray(cfg.center_limit, np.float32),
        }
        assigner = ref_aa.AnchorAssigner(ref_config)

        # anchor construction parity at production scale, in passing
        np.testing.assert_allclose(aset.anchors, assigner.anchors, atol=1e-5)

        a = aset.num_anchors
        nch = aset.num_channels
        fx, fy = int(cfg.feature_map_size[0]), int(cfg.feature_map_size[1])
        rng = np.random.RandomState(42)
        cls_flat = (rng.randn(a, 1) * 1.5 - 5.0).astype(np.float32)
        hot = rng.choice(a, 4000, replace=False)
        cls_flat[hot, 0] = rng.uniform(-3.2, 3.0, 4000).astype(np.float32)
        box_flat = (rng.randn(a, 7) * 0.08).astype(np.float32)
        dir_flat = rng.randn(a, 2).astype(np.float32)
        mask_flat = rng.rand(a) < 0.6

        # ---- reference side --------------------------------------------
        inference = ref_inf.Inference(ref_config, assigner)
        ref_annos = inference.infer_gpu(
            {"anchors_mask": torch.from_numpy(mask_flat[None])},
            {
                "cls_preds": torch.from_numpy(cls_flat[None]),
                "box_preds": torch.from_numpy(box_flat[None]),
                "dir_preds": torch.from_numpy(dir_flat[None]),
            },
        )[0]

        # ---- this repo ---------------------------------------------------
        # flat anchor-major order == row-major (nch, fx, fy) flatten
        preds = {
            "cls_preds": jnp.asarray(cls_flat[:, 0].reshape(1, nch, fx, fy)),
            "box_preds": jnp.asarray(box_flat.T.reshape(7, nch, fx, fy)),
            "dir_preds": jnp.asarray(dir_flat.T.reshape(2, nch, fx, fy)),
        }
        pp = make_postprocessor(cfg, aset)
        det = pp(preds, jnp.asarray(mask_flat.reshape(nch, fx, fy)))
        got = to_annos(cfg, jax.tree.map(np.asarray, det))

        assert list(got["name"]) == list(ref_annos["name"])
        np.testing.assert_allclose(
            got["location"], ref_annos["location"], atol=2e-4
        )
        np.testing.assert_allclose(
            got["dimensions"], ref_annos["dimensions"], atol=2e-4
        )
        np.testing.assert_allclose(
            got["rotation_y"], ref_annos["rotation_y"], atol=2e-4
        )
        np.testing.assert_allclose(got["score"], ref_annos["score"], atol=1e-5)
        # sanity: the scenario actually exercised the pipeline
        assert len(got["name"]) > 50


class TestDataPathParity:
    """Training data-path parity vs the reference's own CPU code, run as
    plain Python via the numba-stub fixture (decorator-stripped functions
    are the same code numba would compile, so semantics are identical).

    Covers framework/voxel_generator.points_to_voxels (the sequential
    first-come-first-serve binning kernel) and
    framework/anchor_assigner.AnchorAssigner.assign (IoU matching with
    force-match ties + box_encode + direction targets) against this repo's
    sort-based voxelizer and vectorized target assigner."""

    # reuse the pipeline fixture's import/stub machinery
    ref_pipeline = TestPipelineParity.ref_pipeline

    def test_voxelizer_matches_reference_kernel(self, ref_pipeline):
        sys.path.insert(0, REF_ROOT)
        try:
            import framework.voxel_generator as ref_vg
        finally:
            sys.path.remove(REF_ROOT)

        from det3d_tpu.ops.voxelize import VoxelizerSpec, voxelize

        cfg = load_config(
            {
                "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
                "voxel_size": [0.4, 0.4, 11.0],
                "max_voxels": 4096,  # must NOT bind (~2.4k distinct cells)
                "max_num_points": 6,
                "max_points": 4096,
            }
        )
        rng = np.random.RandomState(0)
        n = 3000
        pts = np.zeros((cfg.max_points, 4), np.float32)
        pts[:n, :3] = rng.uniform(-18, 18, (n, 3)).astype(np.float32)
        pts[:n, 2] = rng.uniform(-3, 9, n).astype(np.float32)
        pts[:n, 3] = rng.rand(n).astype(np.float32)

        ref_config = {
            "detection_range": list(cfg.detection_range_raw),
            "voxel_size": list(cfg.voxel_size),
            "max_voxels": cfg.max_voxels,
            "max_num_points": cfg.max_num_points,
        }
        gen = ref_vg.VoxelGenerator_trt(ref_config)
        # identical range snap (config.py:_snap_range ↔ voxel_generator.py:7-15)
        np.testing.assert_allclose(gen.offset, cfg.detection_offset, atol=1e-6)
        rv, rc, rn, rnum = gen.generate(pts[:n])

        out = voxelize(
            jnp.asarray(pts), jnp.asarray(np.int32(n)),
            VoxelizerSpec.from_config(cfg), fcfs=True,
        )
        vn = int(out.voxel_num)
        assert vn == rnum
        assert vn < cfg.max_voxels  # premise: the cap did not bind
        np.testing.assert_array_equal(np.asarray(out.coors)[:vn], rc)
        np.testing.assert_array_equal(
            np.asarray(out.num_points_per_voxel)[:vn], rn
        )
        np.testing.assert_array_equal(np.asarray(out.voxels)[:vn], rv)
        assert (np.asarray(out.coors)[vn:] == -1).all()

    def test_voxelizer_cap_binding_pillar_set(self, ref_pipeline):
        """When max_voxels binds, the KEPT PILLAR SET matches the reference
        exactly (fcfs); the documented divergence is only that the reference
        stops consuming points entirely at the first over-cap new cell
        (voxel_generator.py:96-97) while we keep filling open pillars."""
        sys.path.insert(0, REF_ROOT)
        try:
            import framework.voxel_generator as ref_vg
        finally:
            sys.path.remove(REF_ROOT)

        from det3d_tpu.ops.voxelize import VoxelizerSpec, voxelize

        cfg = load_config(
            {
                "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
                "voxel_size": [0.4, 0.4, 11.0],
                "max_voxels": 40,  # binds hard
                "max_num_points": 6,
                "max_points": 2048,
            }
        )
        rng = np.random.RandomState(1)
        n = 1500
        pts = np.zeros((cfg.max_points, 4), np.float32)
        pts[:n, :3] = rng.uniform(-15, 15, (n, 3)).astype(np.float32)
        pts[:n, 2] = 0.0

        ref_config = {
            "detection_range": list(cfg.detection_range_raw),
            "voxel_size": list(cfg.voxel_size),
            "max_voxels": cfg.max_voxels,
            "max_num_points": cfg.max_num_points,
        }
        _, rc, rn, rnum = ref_vg.VoxelGenerator_trt(ref_config).generate(pts[:n])

        out = voxelize(
            jnp.asarray(pts), jnp.asarray(np.int32(n)),
            VoxelizerSpec.from_config(cfg), fcfs=True,
        )
        assert int(out.voxel_num) == rnum == cfg.max_voxels
        np.testing.assert_array_equal(np.asarray(out.coors)[:rnum], rc)
        # open pillars keep filling here, so counts can only be >=
        assert (np.asarray(out.num_points_per_voxel)[:rnum] >= rn).all()

    def test_assign_matches_reference(self, ref_pipeline):
        ref_aa, _ = ref_pipeline
        import torch  # noqa: F401  (parity file convention)

        from det3d_tpu.anchors import build_anchors
        from det3d_tpu.targets import make_target_assigner

        cfg = load_config("configs/ntusl_20cm.json", max_points=1000)
        aset = build_anchors(cfg)
        ref_config = {
            "detection_offset": np.asarray(cfg.detection_offset, np.float32),
            "detection_range_diff": np.asarray(
                cfg.detection_range_diff, np.float32
            ),
            "grid_size": np.asarray(cfg.grid_size, np.int64),
            "voxel_size": np.asarray(cfg.voxel_size, np.float32),
            "box_code_size": cfg.box_code_size,
            "device": None,
            "center_limit": np.asarray(cfg.center_limit, np.float32),
        }
        assigner = ref_aa.AnchorAssigner(ref_config)

        rng = np.random.RandomState(3)
        g = 18
        gt = np.zeros((g, 7), np.float32)
        gt[:, 0] = rng.uniform(-60, 60, g)
        gt[:, 1] = rng.uniform(-60, 60, g)
        gt[:, 2] = rng.uniform(-1.5, 0.5, g)
        sizes = {
            1: [4.6, 2.1, 1.8], 2: [0.97, 0.96, 1.81], 3: [2.0, 0.98, 1.72]
        }
        gt_classes = rng.randint(1, 4, g).astype(np.int32)
        for i in range(g):
            gt[i, 3:6] = np.asarray(sizes[int(gt_classes[i])]) * rng.uniform(
                0.9, 1.1, 3
            )
        gt[:, 6] = rng.uniform(-np.pi, np.pi, g).astype(np.float32)

        # sparse per-anchor mask (the stubbed pure-python iou_jit on the
        # reference side scales with the unmasked anchor count)
        mask_flat = rng.rand(aset.num_anchors) < 0.02

        ref_labels, ref_tgts, ref_w, ref_dir = assigner.assign(
            gt_classes, gt, mask_flat
        )

        assign = make_target_assigner(cfg, aset, use_pallas=False)
        nch = aset.num_channels
        fx, fy = int(cfg.feature_map_size[0]), int(cfg.feature_map_size[1])
        gmax = cfg.max_gt_boxes
        gt_pad = np.ones((gmax, 7), np.float32)
        gt_pad[:g] = gt
        cls_pad = np.zeros((gmax,), np.int32)
        cls_pad[:g] = gt_classes
        valid = np.zeros((gmax,), bool)
        valid[:g] = True
        tgt = assign(
            jnp.asarray(gt_pad), jnp.asarray(cls_pad), jnp.asarray(valid),
            jnp.asarray(mask_flat.reshape(nch, fx, fy)),
        )

        np.testing.assert_array_equal(
            np.asarray(tgt.labels).reshape(-1), ref_labels
        )
        np.testing.assert_array_equal(
            np.asarray(tgt.dir_targets).reshape(-1), ref_dir
        )
        np.testing.assert_array_equal(
            np.asarray(tgt.bbox_outside_weights).reshape(-1), ref_w
        )
        # channel-major (7, nch, fx, fy) → flat anchor-major (A, 7)
        got_tgts = np.asarray(tgt.bbox_targets).reshape(7, -1).T
        np.testing.assert_allclose(got_tgts, ref_tgts, atol=2e-5)
        assert (ref_labels > 0).sum() > 0  # scenario has positives


class TestEvalProtocolParity:
    """Official-AP protocol parity vs the reference's own eval/eval.py.

    Identical fabricated gt/dt annos through BOTH evaluators. The
    reference's `rotate_iou_gpu_eval` CUDA kernel is substituted with this
    repo's `rotate_iou_eval_np` (same signature/criterion codes) on BOTH
    sides, so what this measures is the PROTOCOL: clean_data ignore logic
    (num_points/range/class), adaptive score thresholds, the TP/FP/FN
    matcher, AP@41 summation, and the result formatting — all running as
    the reference's own (numba-stubbed) Python vs this repo's vectorized
    implementation. The rotated-IoU math itself has separate oracle tests
    (tests/test_rotated_iou.py)."""

    ref_pipeline = TestPipelineParity.ref_pipeline

    def test_official_eval_matches_reference(self, ref_pipeline, monkeypatch):
        sys.path.insert(0, REF_ROOT)
        try:
            import eval.eval as ref_eval
        finally:
            sys.path.remove(REF_ROOT)
        from det3d_tpu.eval.ap import get_official_eval_result as ours
        from det3d_tpu.ops.rotated_iou import rotate_iou_eval_np

        # writable copy: d3_box_overlap_kernel_lidar updates rinc in place
        monkeypatch.setattr(
            ref_eval,
            "rotate_iou_gpu_eval",
            lambda b, q, c=-1: np.array(rotate_iou_eval_np(b, q, c), copy=True),
        )

        rng = np.random.RandomState(9)
        classes = ["vehicle", "pedestrian", "cyclist"]
        sizes = {
            "vehicle": [4.6, 2.1, 1.8],
            "pedestrian": [0.97, 0.96, 1.81],
            "cyclist": [2.0, 0.98, 1.72],
        }

        def gt_frame(n):
            names = [classes[i] for i in rng.randint(0, 3, n)]
            loc = np.stack(
                [
                    rng.uniform(-70, 70, n),
                    rng.uniform(-70, 70, n),
                    rng.uniform(-1.5, 0.5, n),
                ],
                axis=1,
            ).astype(np.float64)
            dims = np.stack(
                [np.asarray(sizes[nm]) * rng.uniform(0.9, 1.1, 3) for nm in names]
            ).astype(np.float64)
            return {
                "name": np.asarray(names),
                "location": loc,
                "dimensions": dims,
                "rotation_y": rng.uniform(-np.pi, np.pi, n),
                "num_points": rng.choice([0, 3, 8, 40], n, p=[0.1, 0.2, 0.3, 0.4]),
            }

        def dt_frame(gt):
            n = len(gt["name"])
            keep = rng.rand(n) < 0.8          # misses
            loc = gt["location"][keep] + rng.randn(keep.sum(), 3) * 0.4
            dims = gt["dimensions"][keep] * rng.uniform(0.9, 1.1, (keep.sum(), 3))
            rot = gt["rotation_y"][keep] + rng.randn(keep.sum()) * 0.15
            names = list(gt["name"][keep])
            nf = rng.randint(0, 4)            # false positives
            for _ in range(nf):
                names.append(classes[rng.randint(0, 3)])
            loc = np.concatenate(
                [loc, np.stack(
                    [rng.uniform(-70, 70, nf), rng.uniform(-70, 70, nf),
                     rng.uniform(-1.5, 0.5, nf)], axis=1)]
            )
            dims = np.concatenate(
                [dims, np.stack([np.asarray(sizes[nm]) for nm in names[-nf:]])
                 if nf else np.zeros((0, 3))]
            )
            rot = np.concatenate([rot, rng.uniform(-np.pi, np.pi, nf)])
            return {
                "name": np.asarray(names),
                "location": loc,
                "dimensions": dims,
                "rotation_y": rot,
                "score": rng.rand(len(names)),
            }

        # >= 50 frames: the reference's partitioned-IoU splitter
        # (eval.py:173-180) produces empty parts below its num_parts=50
        gt_annos = [gt_frame(rng.randint(4, 10)) for _ in range(60)]
        dt_annos = [dt_frame(g) for g in gt_annos]

        ref_results, ref_str = ref_eval.get_official_eval_result(
            gt_annos, dt_annos, classes, 80.0
        )
        got_results, got_str = ours(gt_annos, dt_annos, classes, 80.0)

        np.testing.assert_allclose(
            np.asarray(got_results), np.asarray(ref_results), atol=1e-9
        )
        assert got_str == ref_str
        # the scenario is non-trivial: some finite nonzero APs
        assert np.asarray(ref_results).max() > 0


class TestAugmentationParity:
    """Per-object augmentation parity vs the reference's own
    framework/augmentation.py:noise_per_object (numba-stubbed).

    The reference draws its noise arrays BEFORE the sequential collision
    search (augmentation.py:192-194), in the same shapes and order this
    repo's `noise_per_object` does — so seeding both streams identically
    makes the whole pipeline (circle-move candidates, collision rejection
    against evolving corners, first-containing-box point transform)
    deterministic and directly comparable."""

    ref_pipeline = TestPipelineParity.ref_pipeline

    def test_noise_per_object_matches_reference(self, ref_pipeline):
        sys.path.insert(0, REF_ROOT)
        try:
            import framework.augmentation as ref_aug
        finally:
            sys.path.remove(REF_ROOT)
        from det3d_tpu.data.augment import noise_per_object

        rng = np.random.RandomState(5)
        n = 12
        gt = np.zeros((n, 7), np.float64)
        # half clustered (collision rejection exercised), half spread
        gt[: n // 2, 0] = 8.0 + np.arange(n // 2) * 5.0
        gt[: n // 2, 1] = 5.0
        gt[n // 2 :, 0] = rng.uniform(-60, 60, n - n // 2)
        gt[n // 2 :, 1] = rng.uniform(-60, -20, n - n // 2)
        gt[:, 2] = rng.uniform(-1.5, 0.0, n)
        gt[:, 3:6] = np.asarray([4.6, 2.1, 1.8]) * rng.uniform(0.9, 1.1, (n, 3))
        gt[:, 6] = rng.uniform(-np.pi, np.pi, n)

        pts = np.zeros((400, 4), np.float64)
        # points inside boxes + background clutter
        for i in range(n):
            c, s = np.cos(gt[i, 6]), np.sin(gt[i, 6])
            local = rng.uniform(-0.4, 0.4, (20, 2)) * gt[i, 3:5]
            pts[i * 20 : (i + 1) * 20, 0] = gt[i, 0] + local[:, 0] * c - local[:, 1] * s
            pts[i * 20 : (i + 1) * 20, 1] = gt[i, 1] + local[:, 0] * s + local[:, 1] * c
            pts[i * 20 : (i + 1) * 20, 2] = gt[i, 2]  # center plane of the
            # reference-live z window (z±h/2) — safely inside for both
        pts[n * 20 :, :3] = rng.uniform(-70, 70, (400 - n * 20, 3))
        pts[:, 3] = rng.rand(400)

        ref_boxes, ref_pts = gt.copy(), pts.copy()
        np.random.seed(321)
        ref_aug.noise_per_object(ref_boxes, ref_pts)

        got_boxes, got_pts = gt.copy(), pts.copy()
        noise_per_object(got_boxes, got_pts, rng=np.random.RandomState(321))

        np.testing.assert_allclose(got_boxes, ref_boxes, atol=1e-9)
        np.testing.assert_allclose(got_pts, ref_pts, atol=1e-9)
        assert not np.allclose(ref_boxes, gt)  # noise actually applied


class TestAnchorMaskParity:
    """Anchor occupancy-mask parity vs the reference's own CPU path
    (`AnchorAssigner.create_mask(gpu=False)`: sparse_sum_for_anchors_mask →
    2D cumsum SAT → fused_get_anchors_area, box_np_ops.py:159-285), at the
    full production scale (1.44 M anchors)."""

    ref_pipeline = TestPipelineParity.ref_pipeline

    def test_create_mask_matches_reference(self, ref_pipeline):
        ref_aa, _ = ref_pipeline

        from det3d_tpu.anchors import build_anchors
        from det3d_tpu.ops.anchor_mask import compute_anchors_mask

        cfg = load_config("configs/ntusl_20cm.json", max_points=1000)
        aset = build_anchors(cfg)
        ref_config = {
            "detection_offset": np.asarray(cfg.detection_offset, np.float32),
            "detection_range_diff": np.asarray(
                cfg.detection_range_diff, np.float32
            ),
            "grid_size": np.asarray(cfg.grid_size, np.int64),
            "voxel_size": np.asarray(cfg.voxel_size, np.float32),
            "box_code_size": cfg.box_code_size,
            "device": None,
            "center_limit": np.asarray(cfg.center_limit, np.float32),
        }
        assigner = ref_aa.AnchorAssigner(ref_config)

        rng = np.random.RandomState(11)
        nx, ny = cfg.grid_size[0], cfg.grid_size[1]
        cells = rng.choice(nx * ny, 2000, replace=False)
        coors = np.stack(
            [cells // ny, cells % ny, np.zeros_like(cells)], axis=1
        ).astype(np.int32)

        ref_mask = assigner.create_mask(
            coors,
            np.asarray(cfg.grid_size),
            np.asarray(cfg.voxel_size, np.float32),
            np.asarray(cfg.detection_offset, np.float32),
            gpu=False,
        )

        got = np.asarray(
            compute_anchors_mask(
                jnp.asarray(coors), jnp.asarray(aset.corner_cells), (nx, ny)
            )
        )
        assert got.shape[0] == ref_mask.shape[0] == aset.num_anchors
        np.testing.assert_array_equal(got, np.asarray(ref_mask, bool))
        assert 0 < got.sum() < got.size  # non-trivial occupancy


class TestAugmentChainParity:
    """Seeded parity of the FULL host augmentation chain
    (`data/augment.augment_sample`) vs the reference's dataset-order chain
    (framework/dataset.py:122-133: noise_per_object → random_flip →
    global_rotation_v2 → global_scaling_v2 → global_translate). Every
    reference function draws from the global np.random stream in the same
    order this repo's functions draw from their RandomState, so one seed
    makes the whole chain deterministic on both sides."""

    ref_pipeline = TestPipelineParity.ref_pipeline

    def test_chain_matches_reference(self, ref_pipeline):
        sys.path.insert(0, REF_ROOT)
        try:
            import framework.augmentation as ref_aug
        finally:
            sys.path.remove(REF_ROOT)
        from det3d_tpu.data.augment import augment_sample

        rng = np.random.RandomState(8)
        n = 10
        gt = np.zeros((n, 7), np.float64)
        gt[:, 0] = rng.uniform(-50, 50, n)
        gt[:, 1] = rng.uniform(-50, 50, n)
        gt[:, 2] = rng.uniform(-1.5, 0.0, n)
        gt[:, 3:6] = np.asarray([4.6, 2.1, 1.8]) * rng.uniform(0.9, 1.1, (n, 3))
        gt[:, 6] = rng.uniform(-np.pi, np.pi, n)
        pts = np.zeros((300, 4), np.float64)
        pts[: n * 10, :3] = gt[np.repeat(np.arange(n), 10), :3] + rng.randn(n * 10, 3) * 0.3
        pts[n * 10 :, :3] = rng.uniform(-60, 60, (300 - n * 10, 3))
        pts[:, 3] = rng.rand(300)
        augm_mask = rng.rand(n) < 0.7  # reference's augm_class_mask

        rb, rp = gt.copy(), pts.copy()
        np.random.seed(555)
        ref_aug.noise_per_object(rb, rp, augm_mask.copy())
        rb, rp = ref_aug.random_flip(rb, rp)
        rb, rp = ref_aug.global_rotation_v2(rb, rp)
        rb, rp = ref_aug.global_scaling_v2(rb, rp, min_scale=0.95, max_scale=1.05)
        rb, rp = ref_aug.global_translate(rb, rp, noise_translate_std=[0.25, 0.25, 0.25])

        gb, gp = gt.copy(), pts.copy()
        gb, gp = augment_sample(
            gp, gb, gt_valid_mask=augm_mask.copy(),
            rng=np.random.RandomState(555),
        )

        np.testing.assert_allclose(gb, rb, atol=1e-9)
        np.testing.assert_allclose(gp, rp, atol=1e-9)
        assert not np.allclose(rb, gt)


class TestCreateInfoParity:
    """Label-parsing parity vs the reference's own
    `create_info.get_label_anno` (create_info.py:115-157) on a fabricated
    KITTI-format label file + calib: hwl→lwh reorder, camera→lidar location
    conversion, and the rotation_y = limit_period(1.5π − ry) convention."""

    ref_pipeline = TestPipelineParity.ref_pipeline

    def test_get_label_anno_matches_reference(self, ref_pipeline, monkeypatch, tmp_path):
        import types

        fake_io = types.ModuleType("skimage.io")
        fake_io.imread = lambda *a, **k: np.zeros((370, 1224, 3), np.uint8)
        fake_sk = types.ModuleType("skimage")
        fake_sk.io = fake_io
        monkeypatch.setitem(sys.modules, "skimage", fake_sk)
        monkeypatch.setitem(sys.modules, "skimage.io", fake_io)
        sys.path.insert(0, REF_ROOT)
        try:
            import create_info as ref_ci
        finally:
            sys.path.remove(REF_ROOT)

        from det3d_tpu.data.create_info import get_label_anno

        rng = np.random.RandomState(2)
        lines = []
        names = ["Car", "Pedestrian", "Cyclist", "Truck", "DontCare"]
        for i in range(8):
            nm = names[i % len(names)]
            vals = [
                rng.uniform(-np.pi, np.pi),     # alpha
                *rng.uniform(0, 1000, 4),       # bbox
                *rng.uniform(0.5, 4.0, 3),      # dims hwl
                *rng.uniform(-20, 20, 3),       # location (camera)
                rng.uniform(-np.pi, np.pi),     # rotation_y
            ]
            lines.append(
                f"{nm} {rng.uniform(0, 0.5):.6f} {rng.randint(0, 3)} "
                + " ".join(f"{v:.6f}" for v in vals)
            )
        label = tmp_path / "000001.txt"
        label.write_text("\n".join(lines) + "\n")

        # plausible calib: rectification ~identity + a velo→cam transform
        r_rect = np.eye(4)
        r_rect[:3, :3] += rng.randn(3, 3) * 0.01
        velo2cam = np.eye(4)
        velo2cam[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
        velo2cam[:3, 3] = rng.randn(3) * 0.1

        ref_anno = ref_ci.get_label_anno(str(label), r_rect, velo2cam)
        got_anno = get_label_anno(label, r_rect, velo2cam)

        assert list(got_anno["name"]) == list(ref_anno["name"])
        for k in ("truncated", "occluded", "alpha", "bbox", "dimensions",
                  "location", "rotation_y", "score", "index", "group_ids"):
            np.testing.assert_allclose(
                np.asarray(got_anno[k], np.float64),
                np.asarray(ref_anno[k], np.float64),
                atol=1e-12, err_msg=k,
            )


class TestMetricParity:
    """Running precision/recall parity vs the reference's own `Metric`
    (framework/metrics.py:5-67), `.cuda()` no-op'd for CPU torch. Multi-step
    accumulation with the per-threshold guarded updates."""

    ref_pipeline = TestPipelineParity.ref_pipeline

    def test_metric_matches_reference(self, ref_pipeline, monkeypatch):
        monkeypatch.setattr(
            torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
        )
        sys.path.insert(0, REF_ROOT)
        try:
            import framework.metrics as ref_m
        finally:
            sys.path.remove(REF_ROOT)
        from det3d_tpu.train.metrics import RunningMetrics, binary_counts

        rng = np.random.RandomState(4)
        ref_metric = ref_m.Metric()
        got_metric = RunningMetrics()
        for _ in range(5):
            labels = rng.choice([-1, 0, 1], size=(2, 4096), p=[0.3, 0.6, 0.1])
            labels = labels.astype(np.int32)
            preds = (rng.randn(2, 4096, 1) * 2 - 1).astype(np.float32)
            ref_metric.update(labels, torch.from_numpy(preds))
            got_metric.update(
                binary_counts(jnp.asarray(labels), jnp.asarray(preds[..., 0]))
            )
        ref_prec, ref_rec = (np.asarray(v) for v in ref_metric.value)
        got_prec, got_rec = got_metric.value
        np.testing.assert_allclose(got_prec, ref_prec, atol=1e-6)
        np.testing.assert_allclose(got_rec, ref_rec, atol=1e-6)
        assert (got_prec > 0).any() and (got_rec > 0).any()


class TestOptimizerParity:
    """The trainer's optimizer chain vs the reference's actual update rule:
    `torch.nn.utils.clip_grad_norm_(net.parameters(), 10.0)` followed by
    `torch.optim.Adam(..., lr).step()` (reference train.py:60, :107-108).

    Runs both on an identical toy parameter tree with identical fabricated
    gradients for several steps — some with global norm above the 10.0 clip
    (clip active) and some below (inactive) — and compares the resulting
    parameters. Uses the Trainer's OWN `optimizer` attribute
    (optax clip_by_global_norm(10.0) + inject_hyperparams(adam)), so a chain
    regression (order, hyperparams, clip threshold) fails here."""

    def test_adam_with_grad_clip_matches_torch(self):
        import optax
        import torch

        from det3d_tpu.train.trainer import Trainer

        lr = 7e-4
        cfg = _small_parity_cfg().replace(learning_rate=lr)
        optimizer = Trainer(cfg).optimizer

        r = np.random.RandomState(42)
        init = {
            "w": r.randn(4, 3).astype(np.float32),
            "b": r.randn(3).astype(np.float32),
            "k": r.randn(2, 2, 3).astype(np.float32),
        }
        names = sorted(init)
        # step 0/2/4: large grads (global norm >> 10, clip active);
        # step 1/3/5: small grads (clip inactive)
        grads = []
        for step in range(6):
            scale = 25.0 if step % 2 == 0 else 0.05
            grads.append(
                {n: (r.randn(*init[n].shape) * scale).astype(np.float32) for n in names}
            )

        # --- ours: the trainer's actual optax chain
        params = {n: jnp.asarray(v) for n, v in init.items()}
        opt_state = optimizer.init(params)
        for gstep in grads:
            g = {n: jnp.asarray(v) for n, v in gstep.items()}
            updates, opt_state = optimizer.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)

        # --- reference: torch clip_grad_norm_ + Adam (defaults, as train.py)
        tparams = {n: torch.nn.Parameter(torch.from_numpy(init[n].copy())) for n in names}
        topt = torch.optim.Adam([tparams[n] for n in names], lr=lr)
        for gstep in grads:
            topt.zero_grad()
            for n in names:
                tparams[n].grad = torch.from_numpy(gstep[n].copy())
            torch.nn.utils.clip_grad_norm_([tparams[n] for n in names], 10.0)
            topt.step()

        for n in names:
            np.testing.assert_allclose(
                np.asarray(params[n]),
                tparams[n].detach().numpy(),
                rtol=1e-5, atol=1e-6,
                err_msg=f"param {n} diverged from the reference update rule",
            )

    def test_lr_override_matches_reference_resume(self):
        """The reference overrides param_groups[0]['lr'] on resume
        (train.py:73); Trainer.override_lr must actually change the applied
        step size."""
        import optax

        from det3d_tpu.train.trainer import Trainer

        cfg = _small_parity_cfg().replace(learning_rate=1e-3)
        tr = Trainer(cfg)
        params = {"w": jnp.ones((3,), jnp.float32)}
        opt_state = tr.optimizer.init(params)

        class _S:  # minimal TrainState stand-in for override_lr
            def __init__(self, opt_state):
                self.opt_state = opt_state

            def _replace(self, opt_state):
                return _S(opt_state)

        new_state = Trainer.override_lr(_S(opt_state), 5e-4)
        g = {"w": jnp.full((3,), 0.1, jnp.float32)}
        upd_old, _ = tr.optimizer.update(g, opt_state, params)
        upd_new, _ = tr.optimizer.update(g, new_state.opt_state, params)
        # Adam's first-step update magnitude is exactly lr (bias-corrected
        # mhat/sqrt(vhat) = sign(g) for constant grads), so the override
        # must show up as the new lr
        np.testing.assert_allclose(np.abs(np.asarray(upd_old["w"])), 1e-3, rtol=1e-4)
        np.testing.assert_allclose(np.abs(np.asarray(upd_new["w"])), 5e-4, rtol=1e-4)


def _untransplant(net, variables) -> None:
    """Copy a trained Flax variables tree INTO the torch reference model via
    the PRODUCT exporter (deploy/torch_interop.variables_to_state_dict — the
    `cli export-weights` path), so the full-system mAP parity below also
    validates the eject tool. strict=True proves the key set is complete."""
    from det3d_tpu.deploy.torch_interop import variables_to_state_dict

    sd = variables_to_state_dict(
        {
            "params": jax.tree.map(np.asarray, variables["params"]),
            "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"]),
        }
    )
    net.load_state_dict(
        {k: torch.from_numpy(v).to(net.state_dict()[k].dtype) for k, v in sd.items()},
        strict=True,
    )


class _FrozenKeys(dict):
    """dict whose listed pre-seeded keys silently ignore overwrites.

    The reference's AnchorAssigner.__init__ hard-codes the production
    400x400 per-class feature maps INTO the caller's config dict
    (anchor_assigner.py:224-245); freezing those keys lets the reference's
    own __init__ run unmodified at a scaled-down geometry — every other
    field (sizes, rotations, thresholds) is still written by the reference
    itself."""

    def __init__(self, frozen, *a, **k):
        super().__init__(*a, **k)
        self._frozen = set(frozen)

    def __setitem__(self, k, v):
        if k in self._frozen and k in self:
            return
        super().__setitem__(k, v)


class TestFullSystemParity:
    """The whole-framework statement: train a model with THIS repo's
    trainer, transplant the trained weights into the torch reference, and
    run raw synthetic point clouds through BOTH complete systems —

      ours:  Detector.detect (fused voxelize→mask→net→decode→NMS) →
             to_annos → eval/ap.get_official_eval_result
      ref:   InferData.get (VoxelGenerator.generate + create_mask) →
             PointPillars(example) → Inference.infer_gpu →
             eval/eval.get_official_eval_result

    — and require identical detections and identical official mAP. The
    reference side is the reference's OWN code end to end (numba stubbed to
    identity; its CUDA NMS oracle-substituted; its CUDA rotated-IoU in eval
    substituted by rotate_iou_eval_np on the ref side only — ours runs this
    repo's evaluator unmodified). This is the in-environment discharge of
    the 'mAP parity' claim: the real NTU dataset is absent, but on shared
    frames with shared weights the two frameworks produce the same boxes,
    the same scores, and byte-identical official eval output."""

    ref_pipeline = TestPipelineParity.ref_pipeline

    def test_trained_model_end_to_end_same_map(self, ref_pipeline, monkeypatch):
        ref_aa, ref_inf = ref_pipeline
        sys.path.insert(0, REF_ROOT)
        try:
            import eval.eval as ref_eval
            import framework.dataset as ref_ds
            import framework.voxel_generator as ref_vox
            import networks.pointpillars8_shared as ref_net
        finally:
            sys.path.remove(REF_ROOT)

        from det3d_tpu.anchors import build_anchors
        from det3d_tpu.data.synthetic import sample_scene, scene_to_annos
        from det3d_tpu.eval.ap import get_official_eval_result as ours_eval
        from det3d_tpu.ops.rotated_iou import rotate_iou_eval_np
        from det3d_tpu.postprocess import to_annos
        from det3d_tpu.train.trainer import Trainer, host_batch

        monkeypatch.setattr(
            ref_eval,
            "rotate_iou_gpu_eval",
            lambda b, q, c=-1: np.array(rotate_iou_eval_np(b, q, c), copy=True),
        )

        cfg = load_config(
            {
                "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
                "center_limit": [-16.0, -16.0, -10.0, 16.0, 16.0, 10.0],
                "voxel_size": [1.0, 1.0, 11.0],
                "max_voxels": 512,
                "max_num_points": 5,
                "max_points": 8192,
                "max_gt_boxes": 8,
                "batch_size": 2,
                "learning_rate": 2e-3,
                "compute_dtype": "float32",
            }
        )

        # --- train on 2 scenes with THIS repo's trainer (scene 2 held out)
        rng = np.random.RandomState(11)
        scenes = [
            sample_scene(cfg, rng, num_objects=(2, 3), ground_points=1200)
            for _ in range(3)
        ]
        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = jax.device_put(host_batch(cfg, scenes[:2]))
        first = last = None
        for _ in range(200):
            state, loss_dict, _ = trainer.train_step_jit(state, batch)
            last = float(loss_dict["loss"])
            first = first if first is not None else last
        assert last < first * 0.01, (first, last)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        # --- reference stack at the same geometry (frozen feature maps)
        fms = [int(cfg.feature_map_size[0]), int(cfg.feature_map_size[1]), 1]
        ref_config = _FrozenKeys(
            ("vehicle", "pedestrian", "cyclist"),
            {
                "detection_range": np.asarray(cfg.detection_range_raw, np.float32),
                "voxel_size": np.asarray(cfg.voxel_size, np.float32),
                "max_num_points": cfg.max_num_points,
                "max_voxels": cfg.max_voxels,
                "create_mask_gpu": 0,
                "device": torch.device("cpu"),
                "num_point_features": 4,
                "batch_size": 1,
                "box_code_size": 7,
                "center_limit": np.asarray(cfg.center_limit, np.float32),
                "vehicle": _FrozenKeys(
                    ("feature_map_size",), {"feature_map_size": [list(fms)] * 3}
                ),
                "pedestrian": _FrozenKeys(
                    ("feature_map_size",), {"feature_map_size": [list(fms)]}
                ),
                "cyclist": _FrozenKeys(
                    ("feature_map_size",), {"feature_map_size": [list(fms)]}
                ),
            },
        )
        vg = ref_vox.VoxelGenerator(ref_config)
        assigner = ref_aa.AnchorAssigner(ref_config)
        np.testing.assert_allclose(
            build_anchors(cfg).anchors, assigner.anchors, atol=1e-5
        )
        net = ref_net.PointPillars(ref_config)
        _untransplant(net, variables)
        net.eval()
        infer_data = ref_ds.InferData(ref_config, vg, assigner)
        inference = ref_inf.Inference(ref_config, assigner)

        # --- raw points through BOTH complete systems
        dt_ours, dt_ref = [], []
        for scene in scenes:
            pts = scene["points"].astype(np.float32)
            ppts, n = trainer.detector.pad_points(pts)
            det = trainer.eval_step_jit(state, ppts, n)
            dt_ours.append(to_annos(cfg, jax.device_get(det)))
            example = infer_data.get(pts)
            with torch.no_grad():
                preds = net(example)
            dt_ref.append(inference.infer_gpu(example, preds)[0])

        total = 0
        for a, b in zip(dt_ours, dt_ref):
            assert list(a["name"]) == list(b["name"])
            if len(a["name"]):
                np.testing.assert_allclose(a["location"], b["location"], atol=1e-4)
                np.testing.assert_allclose(a["dimensions"], b["dimensions"], atol=1e-4)
                np.testing.assert_allclose(a["rotation_y"], b["rotation_y"], atol=1e-4)
                np.testing.assert_allclose(a["score"], b["score"], atol=1e-5)
            total += len(a["name"])
        assert total >= 5 and max(float(a["score"].max()) for a in dt_ours if len(a["name"])) > 0.8

        # --- official mAP from both evaluators (frames replicated to 60:
        # the reference splitter makes empty parts below num_parts=50,
        # eval.py:173-180; replication scales TP/FP equally so AP is
        # unchanged)
        gt = [scene_to_annos(s, cfg) for s in scenes]
        rep = 20
        classes = list(cfg.detect_class)
        res_ours, str_ours = ours_eval(gt * rep, dt_ours * rep, classes, 80.0)
        res_ref, str_ref = ref_eval.get_official_eval_result(
            gt * rep, dt_ref * rep, classes, 80.0
        )
        np.testing.assert_allclose(
            np.asarray(res_ours), np.asarray(res_ref), atol=1e-9
        )
        assert str_ours == str_ref
        # the trained model actually detects: vehicle BEV AP well above zero
        assert np.asarray(res_ref).max() > 50.0
