import jax
import jax.numpy as jnp
import numpy as np

from det3d_tpu.anchors import build_anchors
from det3d_tpu.models.pointpillars import (
    PFN,
    RPN,
    SharedHead,
    scatter_to_bev,
    scatter_to_bev_s2d,
)
from det3d_tpu.pipeline import Detector
from helpers import small_cfg, random_cloud


def merge_parity(v):
    """Split-head preds come as per-column-parity pairs (…, w/2) x 2 with
    full-map column w = 2·y2 + p; interleave back to the merged form."""
    if isinstance(v, tuple):
        a, b = np.asarray(v[0]), np.asarray(v[1])
        full = np.empty(a.shape[:-1] + (a.shape[-1] * 2,), a.dtype)
        full[..., 0::2] = a
        full[..., 1::2] = b
        return full
    return np.asarray(v)


class TestPFN:
    def test_decoration_and_masking(self):
        """Cluster-mean / center offsets computed by hand for one pillar."""
        pfn = PFN(voxel_size=(1.0, 1.0, 11.0), offset=(-8.0, -8.0, -2.5),
                  compute_dtype=jnp.float32)
        voxels = np.zeros((1, 2, 3, 4), np.float32)
        voxels[0, 0, 0] = [0.2, 0.4, 1.0, 0.5]
        voxels[0, 0, 1] = [0.4, 0.2, 2.0, 0.7]
        num = np.array([[2, 0]], np.int32)
        coors = np.array([[[8, 8, 0], [-1, -1, -1]]], np.int32)

        variables = pfn.init(jax.random.PRNGKey(0), voxels, num, coors, False)
        out = pfn.apply(variables, voxels, num, coors, False)
        assert out.shape == (1, 2, 64)
        # empty pillar must be exactly zero
        np.testing.assert_array_equal(np.asarray(out[0, 1]), 0.0)

    def test_empty_pillar_does_not_pollute_bn_stats(self):
        pfn = PFN(voxel_size=(1.0, 1.0, 11.0), offset=(-8.0, -8.0, -2.5),
                  compute_dtype=jnp.float32)
        r = np.random.RandomState(0)
        voxels = r.randn(1, 8, 3, 4).astype(np.float32)
        num = np.array([[3, 3, 3, 3, 0, 0, 0, 0]], np.int32)
        coors = np.zeros((1, 8, 3), np.int32)
        variables = pfn.init(jax.random.PRNGKey(0), voxels, num, coors, True)
        _, updates = pfn.apply(
            variables, voxels, num, coors, True, mutable=["batch_stats"]
        )
        # doubling the number of *empty* pillars must not change batch stats
        voxels2 = np.concatenate([voxels, np.zeros_like(voxels)], axis=1)
        num2 = np.concatenate([num, np.zeros_like(num)], axis=1)
        coors2 = np.concatenate([coors, np.zeros_like(coors)], axis=1)
        _, updates2 = pfn.apply(
            variables, voxels2, num2, coors2, True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(updates["batch_stats"]["pfn_bn"]["mean"]),
            np.asarray(updates2["batch_stats"]["pfn_bn"]["mean"]),
            rtol=1e-5,
        )


class TestScatter:
    def test_scatter_and_drop(self):
        feats = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
        coors = np.array([[[1, 2, 0], [3, 0, 0], [-1, -1, -1]]], np.int32)
        canvas = np.asarray(scatter_to_bev(jnp.asarray(feats), jnp.asarray(coors), (4, 4)))
        np.testing.assert_array_equal(canvas[0, 1, 2], feats[0, 0])
        np.testing.assert_array_equal(canvas[0, 3, 0], feats[0, 1])
        assert canvas.sum() == feats[0, :2].sum()  # dropped row contributes nothing


class TestRPN:
    def test_output_shape(self):
        rpn = RPN(compute_dtype=jnp.float32)
        x = jnp.zeros((1, 16, 16, 64))
        variables = rpn.init(jax.random.PRNGKey(0), x)
        out = rpn.apply(variables, x)
        assert out.shape == (1, 8, 8, 320)


class TestLateBlocked:
    def test_late_blocked_rpn_matches_dense(self):
        """RPN.late_blocked (Config.late_blocked_train): blocks 1-2 run
        batch-over-blocks with fresh 5-row halos; forward outputs and input/
        param grads must match the dense path (f32 stat-association only).
        A tall narrow map engages both late blocks (block1 rows_out 128 →
        nblk 4, block2 rows_out 64 → nblk 2) at CPU-test cost."""
        bsz, h2, w2, c4 = 1, 256, 16, 256  # packed s2d canvas, H=512 W=64
        r = np.random.RandomState(7)
        x = jnp.asarray(r.randn(bsz, h2, w2, c4).astype(np.float32))
        dense = RPN(compute_dtype=jnp.float32, pack_w=True, fuse_in_stats=False)
        blk = RPN(
            compute_dtype=jnp.float32, pack_w=True, fuse_in_stats=False,
            late_blocked=True,
        )
        v = dense.init(jax.random.PRNGKey(0), x)
        out_d = dense.apply(v, x)
        out_b = blk.apply(v, x)
        assert out_b.shape == out_d.shape
        np.testing.assert_allclose(
            np.asarray(out_b), np.asarray(out_d), rtol=1e-4, atol=1e-4
        )

        w = jnp.asarray(r.randn(*out_d.shape).astype(np.float32))

        def loss(mod):
            return lambda params, xx: jnp.sum(
                jnp.tanh(mod.apply(params, xx) / 4.0) * w
            )

        gd_p, gd_x = jax.grad(loss(dense), argnums=(0, 1))(v, x)
        gb_p, gb_x = jax.grad(loss(blk), argnums=(0, 1))(v, x)
        np.testing.assert_allclose(
            np.asarray(gb_x), np.asarray(gd_x), rtol=1e-3, atol=2e-4
        )
        fd = {str(k): a for k, a in jax.tree_util.tree_leaves_with_path(gd_p)}
        fb = {str(k): a for k, a in jax.tree_util.tree_leaves_with_path(gb_p)}
        assert fd.keys() == fb.keys()
        for k in fd:
            np.testing.assert_allclose(
                np.asarray(fb[k]), np.asarray(fd[k]), rtol=1e-3, atol=2e-4,
                err_msg=k,
            )


class TestHeadOrdering:
    def test_anchor_major_layout(self):
        """A delta at one (x, y) location must land at flat indices
        a*H*W + x*W + y for every anchor channel a — the anchors.py
        anchor-major contract (the spatial (k, a, h, w) preds flatten
        row-major to the reference's flat anchor order)."""
        h = w = 8
        a = 9
        head = SharedHead(num_anchor_per_loc=a, compute_dtype=jnp.float32)
        x = jnp.zeros((1, h, w, 16))
        variables = head.init(jax.random.PRNGKey(0), x)
        xi, yi = 3, 5
        x = x.at[0, xi, yi, :].set(1.0)
        out = head.apply(variables, x)
        base = head.apply(variables, jnp.zeros_like(x))
        assert out["cls_preds"].shape == (1, 1, a, h, w)
        diff = np.abs(np.asarray(out["cls_preds"] - base["cls_preds"]))[0, 0]
        hit = np.nonzero(diff.reshape(-1) > 1e-9)[0]
        expected = np.array([ai * h * w + xi * w + yi for ai in range(a)])
        np.testing.assert_array_equal(np.sort(hit), expected)


class TestEndToEnd:
    def test_infer_shapes_and_validity(self):
        cfg = small_cfg()
        det = Detector(cfg)
        variables = det.init_variables(jax.random.PRNGKey(0))
        pts, n = det.pad_points(random_cloud(200))
        out = det.infer(variables, jnp.asarray(pts), jnp.asarray(n))
        assert out.boxes.shape == (3, 300, 7)
        assert out.scores.shape == (3, 300)
        assert out.valid.shape == (3, 300)
        # valid detections (random weights) must carry finite boxes
        v = np.asarray(out.valid)
        assert np.isfinite(np.asarray(out.boxes)[v]).all()

    def test_anchor_count_matches(self):
        cfg = small_cfg()
        aset = build_anchors(cfg)
        assert aset.num_anchors == cfg.num_anchors == 5 * 8 * 8


class TestMultiHead:
    def test_multi_head_matches_shared_contract(self):
        """MultiHead must emit the same shapes/anchor-major layout as
        SharedHead so losses/postprocess are head-agnostic."""
        import jax
        import numpy as np

        from det3d_tpu.pipeline import Detector
        from helpers import small_cfg

        cfg = small_cfg().replace(head="multi")
        det = Detector(cfg)
        v = det.init_variables(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        pts = np.concatenate(
            [rng.uniform(-7, 7, (500, 2)), rng.uniform(-2, 6, (500, 1)),
             rng.uniform(0, 1, (500, 1))], 1).astype(np.float32)
        padded, n = det.pad_points(pts)
        out = det.infer_jit(v, padded, n)
        assert np.asarray(out.boxes).shape[0] == len(cfg.class_specs)
        annos = det.detect(v, pts)
        assert "name" in annos


class TestInstanceNormVJP:
    @staticmethod
    def _in_autodiff(x, packed):
        """The same forward math WITHOUT the custom VJP (autodiff oracle)."""
        from det3d_tpu.models.pointpillars import _in_moments

        mean, inv, _ = _in_moments(x, packed)
        inv_c = inv[:, None, None].astype(x.dtype)
        return (x - mean[:, None, None].astype(x.dtype)) * inv_c

    def test_grad_matches_autodiff(self):
        from det3d_tpu.models.pointpillars import _instance_norm

        r = np.random.RandomState(0)
        for packed, shape in [(False, (2, 8, 6, 16)), (True, (2, 8, 3, 32))]:
            x = jnp.asarray(r.randn(*shape).astype(np.float32) * 2 + 0.5)
            w = jnp.asarray(r.randn(*shape).astype(np.float32))

            g_custom = jax.grad(
                lambda x: jnp.sum(jnp.tanh(_instance_norm(x, "t", packed)) * w)
            )(x)
            g_auto = jax.grad(
                lambda x: jnp.sum(jnp.tanh(self._in_autodiff(x, packed)) * w)
            )(x)
            np.testing.assert_allclose(
                np.asarray(g_custom), np.asarray(g_auto), rtol=1e-4, atol=1e-5,
                err_msg=f"packed={packed}",
            )

    def test_forward_unchanged(self):
        from det3d_tpu.models.pointpillars import _instance_norm

        r = np.random.RandomState(1)
        x = jnp.asarray(r.randn(1, 10, 10, 8).astype(np.float32))
        y = np.asarray(_instance_norm(x, "t", False))
        ref = np.asarray(x)
        m = ref.reshape(100, 8).mean(0)
        v = ref.reshape(100, 8).var(0)
        want = (ref - m) / np.sqrt(v + 1e-3)
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)


class TestGramINStats:
    """Inference-path branch INs with statistics from input Gram matrices
    (models/pointpillars._gram_moments) must reproduce the materialized-map
    statistics — and the end-to-end fused pipeline must match the unfused."""

    def test_deconv_gram_matches_materialized(self):
        from det3d_tpu.models.pointpillars import (
            DeconvUpsample, _gram_moments, _in_moments,
        )

        r = np.random.RandomState(0)
        s, c, o = 2, 12, 10
        x = jnp.asarray(r.randn(2, 6, 4, c).astype(np.float32) * 1.5 + 0.3)
        kernel = jnp.asarray(r.randn(s, s, c, o).astype(np.float32))

        # fine map the unfused path materializes (unpacked layout: the stats
        # are layout-invariant)
        mod = DeconvUpsample(o, s, jnp.float32, packed_out=False)
        y, vars_ = mod.init_with_output(jax.random.PRNGKey(0), x)
        vars_ = {"params": {"kernel": kernel}}
        y = mod.apply(vars_, x)
        mean_ref, inv_ref, _ = _in_moments(y, packed=False)

        kf = kernel[::-1, ::-1].reshape(s * s, c, o).transpose(1, 0, 2)
        mean, inv = _gram_moments(x, kf, 6 * 4 * s * s)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(inv), np.asarray(inv_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_fused_pipeline_matches_unfused(self):
        from det3d_tpu.pipeline import Detector
        from helpers import small_cfg, random_cloud

        cfg_f = small_cfg().replace(pack_w=True)     # fuse_in_stats default on
        cfg_u = cfg_f.replace(fuse_in_stats=False)
        det_f, det_u = Detector(cfg_f), Detector(cfg_u)
        v = det_u.init_variables(jax.random.PRNGKey(0))
        pts, n = det_u.pad_points(random_cloud(220, seed=5))
        frame, _ = det_u.preprocess(jnp.asarray(pts), jnp.asarray(n))
        args = (frame.voxels[None], frame.num_points_per_voxel[None],
                frame.coors[None])
        out_u = det_u.model.apply(v, *args, train=False)
        out_f = det_f.model.apply(v, *args, train=False)
        for k in out_u:
            np.testing.assert_allclose(
                np.asarray(out_f[k]), np.asarray(out_u[k]), atol=2e-5,
                err_msg=k,
            )

    def test_split_out_head_matches_merged(self):
        """The per-parity neck emission + two-dot SharedHead (split_out, the
        packed production path) must match the merged-map single-dot form:
        both contract the same 320 channels — only the relayout of the neck
        map moves to the 90-channel head output. (The neck halves are exact;
        head preds are allclose-tight: XLA vectorizes the f32 contraction
        differently for the half-width operand.)"""
        from det3d_tpu.models.pointpillars import RPN, SharedHead

        r = np.random.RandomState(7)
        x = jnp.asarray(r.randn(1, 8, 4, 16).astype(np.float32))
        kw = dict(compute_dtype=jnp.float32, pack_w=True,
                  num_filters=(8, 12, 16), num_upsample_filters=(8, 12, 12))
        for fuse in (False, True):
            rpn_m = RPN(fuse_in_stats=fuse, split_out=False, **kw)
            rpn_s = RPN(fuse_in_stats=fuse, split_out=True, **kw)
            v = rpn_m.init(jax.random.PRNGKey(0), x)
            merged = rpn_m.apply(v, x)
            split = rpn_s.apply(v, x)
            assert isinstance(split, tuple) and len(split) == 2
            # the split halves ARE the merged map's column parities
            np.testing.assert_array_equal(np.asarray(split[0]),
                                          np.asarray(merged[:, :, 0::2]))
            np.testing.assert_array_equal(np.asarray(split[1]),
                                          np.asarray(merged[:, :, 1::2]))
            head = SharedHead(num_anchor_per_loc=9, compute_dtype=jnp.float32)
            hv = head.init(jax.random.PRNGKey(1), merged)
            out_m = head.apply(hv, merged)
            out_s = head.apply(hv, split)
            for k in out_m:
                # split preds stay per-parity pairs; interleave to compare
                assert isinstance(out_s[k], tuple)
                np.testing.assert_allclose(
                    np.asarray(out_m[k]), merge_parity(out_s[k]),
                    rtol=1e-5, atol=1e-6, err_msg=k,
                )

    def test_train_path_never_fuses(self):
        """Training must keep the analytic-VJP _instance_norm graph: the
        fused-stat epilogue has no custom VJP and would change the tuned
        train step. Verified structurally: train=True applies per-branch
        `deconv{b}_in` via _instance_norm whose jaxpr contains the custom
        vjp call; simplest observable — outputs differ appropriately is
        already covered; here assert flag plumbing."""
        from det3d_tpu.models.pointpillars import RPN

        r = np.random.RandomState(2)
        x = jnp.asarray(r.randn(1, 8, 4, 16).astype(np.float32))
        rpn = RPN(compute_dtype=jnp.float32, pack_w=True, fuse_in_stats=True,
                  num_filters=(8, 12, 16), num_upsample_filters=(8, 12, 12))
        v = rpn.init(jax.random.PRNGKey(0), x)
        # fused RPN must create NO extra parameters vs the unfused one (IN is
        # stateless): identical param trees
        rpn_u = RPN(compute_dtype=jnp.float32, pack_w=True, fuse_in_stats=False,
                    num_filters=(8, 12, 16), num_upsample_filters=(8, 12, 12))
        v_u = rpn_u.init(jax.random.PRNGKey(0), x)
        ta = jax.tree.map(lambda a, b: a.shape == b.shape, v, v_u)
        assert all(jax.tree.leaves(ta))
        out_f = rpn.apply(v, x)
        out_u = rpn_u.apply(v_u, x)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                                   rtol=1e-4, atol=1e-5)


class TestPackedBlock0:
    def test_packed_matches_plain_conv_pipeline(self):
        """Same params → (numerically) same predictions whether block0 runs
        on the dense canvas or w-parity packed (s2d canvas + rearranged
        kernels with structured zeros). The packing is weight-side only, so
        one parameter tree drives both."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from det3d_tpu.pipeline import Detector
        from helpers import small_cfg, random_cloud

        cfg_plain = small_cfg().replace(pack_w=False)
        cfg_pack = small_cfg().replace(pack_w=True)
        det_p = Detector(cfg_plain)
        det_s = Detector(cfg_pack)
        v = det_p.init_variables(jax.random.PRNGKey(0))  # same tree for both
        chex = jax.tree.map(lambda a, b: a.shape == b.shape, v,
                            det_s.init_variables(jax.random.PRNGKey(0)))
        assert all(jax.tree.leaves(chex)), "param trees must be identical"

        pts, n = det_p.pad_points(random_cloud(220, seed=5))
        frame, mask = det_p.preprocess(jnp.asarray(pts), jnp.asarray(n))
        args = (frame.voxels[None], frame.num_points_per_voxel[None], frame.coors[None])
        out_p = det_p.model.apply(v, *args, train=False)
        out_s = det_s.model.apply(v, *args, train=False)
        for k in out_p:
            # the packed inference path emits per-parity pairs (split head)
            np.testing.assert_allclose(
                np.asarray(out_p[k]), merge_parity(out_s[k]), atol=2e-4,
                err_msg=k,
            )

    def test_split_head_lever_preds_identical(self):
        """Config.split_head=False must keep the packed inference preds
        bit-identical (f32): the merged parity-outer concat and the split
        per-parity two-dot head are the same function, differently
        associated only in layout, not arithmetic."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from det3d_tpu.pipeline import Detector
        from helpers import small_cfg, random_cloud

        det_on = Detector(small_cfg().replace(pack_w=True, split_head=True))
        det_off = Detector(small_cfg().replace(pack_w=True, split_head=False))
        v = det_on.init_variables(jax.random.PRNGKey(2))
        pts, n = det_on.pad_points(random_cloud(260, seed=9))
        frame, _ = det_on.preprocess(jnp.asarray(pts), jnp.asarray(n))
        args = (frame.voxels[None], frame.num_points_per_voxel[None], frame.coors[None])
        out_on = det_on.model.apply(v, *args, train=False)
        out_off = det_off.model.apply(v, *args, train=False)
        for k in out_off:
            np.testing.assert_array_equal(
                np.asarray(merge_parity(out_on[k])), np.asarray(out_off[k]),
                err_msg=k,
            )

    def test_packed_grad_matches_plain(self):
        """Training must see the same function: grads through the packed
        RPN match the plain RPN's for the same parameters."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from det3d_tpu.pipeline import Detector
        from helpers import small_cfg, random_cloud

        det_p = Detector(small_cfg().replace(pack_w=False))
        det_s = Detector(small_cfg().replace(pack_w=True))
        v = det_p.init_variables(jax.random.PRNGKey(1))
        pts, n = det_p.pad_points(random_cloud(180, seed=7))
        frame, _ = det_p.preprocess(jnp.asarray(pts), jnp.asarray(n))
        args = (frame.voxels[None], frame.num_points_per_voxel[None], frame.coors[None])

        def loss(det):
            def f(params):
                out = det.model.apply(
                    {"params": params, **{k: v[k] for k in v if k != "params"}},
                    *args, train=False,
                )
                # tree.leaves covers the split-head per-parity pairs too:
                # the parities partition the map, so the tanh-sum is the same
                return sum(jnp.sum(jnp.tanh(o)) for o in jax.tree.leaves(out))
            return f

        gp = jax.grad(loss(det_p))(v["params"])
        gs = jax.grad(loss(det_s))(v["params"])
        flat_p, _ = jax.tree.flatten(gp)
        flat_s, _ = jax.tree.flatten(gs)
        for a, b in zip(flat_p, flat_s):
            # differently-associated f32 sums: ~1e-5 relative noise is expected
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-3
            )


class TestScatterPallas:
    def test_matches_xla_scatter(self):
        """Pallas canvas builder (interpret mode) vs the XLA scatter."""
        import jax.numpy as jnp

        from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_pallas

        r = np.random.RandomState(0)
        b, v, c, nx, ny = 2, 37, 8, 20, 25
        feats = r.randn(b, v, c).astype(np.float32)
        coors = np.full((b, v, 3), -1, np.int32)
        for bi in range(b):
            n_valid = 30
            cells = r.choice(nx * ny, n_valid, replace=False)
            coors[bi, :n_valid, 0] = cells // ny
            coors[bi, :n_valid, 1] = cells % ny
            coors[bi, :n_valid, 2] = 0
        ref = np.asarray(scatter_to_bev(jnp.asarray(feats), jnp.asarray(coors), (nx, ny)))
        got = np.asarray(
            scatter_to_bev_pallas(
                jnp.asarray(feats), jnp.asarray(coors), (nx, ny), interpret=True
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_all_empty(self):
        import jax.numpy as jnp

        from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_pallas

        feats = np.ones((1, 5, 4), np.float32)
        coors = np.full((1, 5, 3), -1, np.int32)
        got = np.asarray(
            scatter_to_bev_pallas(jnp.asarray(feats), jnp.asarray(coors), (8, 8), interpret=True)
        )
        assert got.shape == (1, 8, 8, 4)
        assert (got == 0).all()

    def test_s2d_matches_xla_s2d_scatter(self):
        """Pallas s2d canvas builder (interpret) vs the XLA s2d scatter."""
        import jax.numpy as jnp

        from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_s2d_pallas

        r = np.random.RandomState(1)
        b, v, c, nx, ny = 2, 41, 8, 12, 20
        feats = r.randn(b, v, c).astype(np.float32)
        coors = np.full((b, v, 3), -1, np.int32)
        for bi in range(b):
            cells = r.choice(nx * ny, 30, replace=False)
            coors[bi, :30, 0] = cells // ny
            coors[bi, :30, 1] = cells % ny
            coors[bi, :30, 2] = 0
        ref = np.asarray(
            scatter_to_bev_s2d(jnp.asarray(feats), jnp.asarray(coors), (nx, ny))
        )
        got = np.asarray(
            scatter_to_bev_s2d_pallas(
                jnp.asarray(feats), jnp.asarray(coors), (nx, ny), True
            )
        )
        np.testing.assert_array_equal(got, ref)
        # w_major emits the canvas physically W-major but returns the same
        # logical (B, nx2, ny2, 4C) tensor (inference-path layout variant)
        got_wm = np.asarray(
            scatter_to_bev_s2d_pallas(
                jnp.asarray(feats), jnp.asarray(coors), (nx, ny), True, True
            )
        )
        np.testing.assert_array_equal(got_wm, ref)

    def test_s2d_grad_matches_xla(self):
        import jax
        import jax.numpy as jnp

        from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_s2d_pallas

        r = np.random.RandomState(5)
        b, v, c, nx, ny = 1, 16, 4, 8, 8
        feats = jnp.asarray(r.randn(b, v, c).astype(np.float32))
        coors = np.full((b, v, 3), -1, np.int32)
        cells = r.choice(nx * ny, 12, replace=False)
        coors[0, :12, 0] = cells // ny
        coors[0, :12, 1] = cells % ny
        coors[0, :12, 2] = 0
        coors = jnp.asarray(coors)
        w = jnp.asarray(r.randn(nx // 2, ny // 2, 4 * c).astype(np.float32))

        gp = jax.grad(
            lambda f: jnp.sum(
                jnp.tanh(scatter_to_bev_s2d_pallas(f, coors, (nx, ny), True)) * w
            )
        )(feats)
        gx = jax.grad(
            lambda f: jnp.sum(jnp.tanh(scatter_to_bev_s2d(f, coors, (nx, ny))) * w)
        )(feats)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-6)
        gw = jax.grad(
            lambda f: jnp.sum(
                jnp.tanh(scatter_to_bev_s2d_pallas(f, coors, (nx, ny), True, True)) * w
            )
        )(feats)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gx), atol=1e-6)

    def test_blocked_scatter_matches_plain_with_halos(self):
        """scatter_to_bev_s2d_blocked: reassembled blocks == plain s2d canvas
        and every halo row equals its neighbor-row duplicate (zeros past the
        canvas edge)."""
        import jax.numpy as jnp

        from det3d_tpu.kernels.scatter_pallas import (
            _scatter_s2d_fwd_impl,
            scatter_to_bev_s2d_blocked,
        )

        r = np.random.RandomState(0)
        b, v, c, nx, ny = 2, 57, 8, 24, 20
        feats = r.randn(b, v, c).astype(np.float32)
        coors = np.full((b, v, 3), -1, np.int32)
        for bi in range(b):
            cells = r.choice(nx * ny, 40, replace=False)
            coors[bi, :40, 0] = cells // ny
            coors[bi, :40, 1] = cells % ny
            coors[bi, :40, 2] = 0

        plain = np.asarray(
            _scatter_s2d_fwd_impl(jnp.asarray(feats), jnp.asarray(coors), (nx, ny), True)
        )
        nblk, ht, hb = 3, 4, 3
        blk = np.asarray(
            scatter_to_bev_s2d_blocked(
                jnp.asarray(feats), jnp.asarray(coors), (nx, ny), nblk, (ht, hb), True
            )
        )
        nx2, ny2 = nx // 2, ny // 2
        rb = nx2 // nblk
        padded = np.zeros((b, nx2 + ht + hb, ny2, 4 * c), plain.dtype)
        padded[:, ht : ht + nx2] = plain
        for k in range(nblk):
            np.testing.assert_array_equal(
                blk[:, k], padded[:, k * rb : k * rb + rb + ht + hb]
            )

    def test_blocked_block0_preds_bit_identical(self):
        """Config.block0_blocked: the blocked-halo block0 (VALID-row convs,
        margin-masked INs) produces BIT-IDENTICAL predictions to the plain
        packed pipeline in f32 — the halo bookkeeping is exact, including
        the out-of-canvas zero rows an IN would otherwise shift off zero."""
        import jax

        from det3d_tpu.config import load_config
        from det3d_tpu.ops.voxelize import VoxelizerSpec, voxelize
        from det3d_tpu.pipeline import Detector

        cfg = load_config({
            "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
            "center_limit": [-16.0, -16.0, -10.0, 16.0, 16.0, 10.0],
            "voxel_size": [1.0, 1.0, 11.0],
            "max_voxels": 256, "max_num_points": 5, "batch_size": 1,
            "max_points": 4096, "max_gt_boxes": 8, "compute_dtype": "float32",
        })  # 32² grid → nx2=16 → nblk=2 (the small_cfg 16² grid disables it)
        det_a = Detector(cfg)
        det_b = Detector(cfg.replace(block0_blocked=True))
        v = det_a.init_variables(jax.random.PRNGKey(0))
        r = np.random.RandomState(0)
        pts = np.concatenate(
            [r.uniform(-15, 15, (3000, 2)), r.uniform(-2, 6, (3000, 1)),
             r.uniform(0, 1, (3000, 1))], 1).astype(np.float32)
        padded, n = det_a.pad_points(pts)
        fr = voxelize(padded, np.int32(n), VoxelizerSpec.from_config(cfg))
        args = (fr.voxels[None], fr.num_points_per_voxel[None], fr.coors[None])
        pa = det_a.model.apply(v, *args, train=False)
        pb = det_b.model.apply(v, *args, train=False)
        for a_leaf, b_leaf in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
            np.testing.assert_array_equal(np.asarray(a_leaf), np.asarray(b_leaf))

    def test_blocked_scatter_grad_matches_reference(self):
        """scatter_to_bev_s2d_blocked's VJP (Config.block0_blocked_train)
        must equal the grad of the differentiable reference construction
        (dense s2d scatter → pad → overlapping block slices) — including
        the halo duplicates, whose cotangents must SUM per pillar."""
        from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_s2d_blocked

        r = np.random.RandomState(11)
        b, v, c, nx, ny = 2, 57, 8, 24, 20
        nblk, ht, hb = 3, 4, 3
        nx2, ny2 = nx // 2, ny // 2
        rb = nx2 // nblk
        feats = jnp.asarray(r.randn(b, v, c).astype(np.float32))
        coors = np.full((b, v, 3), -1, np.int32)
        for bi in range(b):
            cells = r.choice(nx * ny, 40, replace=False)
            coors[bi, :40, 0] = cells // ny
            coors[bi, :40, 1] = cells % ny
            coors[bi, :40, 2] = 0
        coors = jnp.asarray(coors)
        w = jnp.asarray(
            r.randn(b, nblk, rb + ht + hb, ny2, 4 * c).astype(np.float32)
        )

        def ref_blocked(f):
            dense = scatter_to_bev_s2d(f, coors, (nx, ny))
            padded = jnp.pad(dense, ((0, 0), (ht, hb), (0, 0), (0, 0)))
            return jnp.stack(
                [padded[:, k * rb : k * rb + rb + ht + hb] for k in range(nblk)],
                axis=1,
            )

        gk = jax.grad(
            lambda f: jnp.sum(
                jnp.tanh(
                    scatter_to_bev_s2d_blocked(f, coors, (nx, ny), nblk, (ht, hb), True)
                )
                * w
            )
        )(feats)
        gr = jax.grad(lambda f: jnp.sum(jnp.tanh(ref_blocked(f)) * w))(feats)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-6)

    def test_blocked_train_step_matches_dense(self):
        """Config.block0_blocked_train: one full optimizer step (losses,
        targets, grads, Adam update) on the blocked block0 matches the dense
        packed path in f32 — the lever is semantics-preserving under grad."""
        from det3d_tpu.config import load_config
        from det3d_tpu.data.synthetic import sample_scene
        from det3d_tpu.train.trainer import Trainer, host_batch

        base = load_config({
            "detection_range": [-16.0, -16.0, -2.5, 16.0, 16.0, 8.5],
            "center_limit": [-16.0, -16.0, -10.0, 16.0, 16.0, 10.0],
            "voxel_size": [1.0, 1.0, 11.0],
            "max_voxels": 256, "max_num_points": 5, "batch_size": 2,
            "max_points": 4096, "max_gt_boxes": 8, "compute_dtype": "float32",
        })  # 32² grid → nblk=2 (small_cfg's 16² grid disables blocking)
        rng = np.random.RandomState(2)
        scenes = [sample_scene(base, rng) for _ in range(2)]

        import optax

        results = []
        for flag in (False, True):
            cfg = base.replace(block0_blocked_train=flag)
            trainer = Trainer(cfg)
            # SGD(1.0) instead of Adam so the one-step param delta IS the
            # gradient — Adam's first update is ≈ lr·sign(g), where f32
            # association drift in a near-zero grad flips to a full-lr
            # param difference and the comparison tells us nothing
            trainer.optimizer = optax.sgd(1.0)
            state = trainer.init_state(jax.random.PRNGKey(0))
            p0 = jax.device_get(state.params)
            batch = jax.device_put(host_batch(cfg, scenes))
            state, loss_dict, _ = trainer.train_step_jit(state, batch)
            grads = jax.tree.map(
                lambda a, b: a - b, p0, jax.device_get(state.params)
            )
            results.append((jax.device_get(loss_dict), grads))

        (ld_a, g_a), (ld_b, g_b) = results
        for k in ld_a:
            np.testing.assert_allclose(ld_a[k], ld_b[k], rtol=1e-5, atol=1e-6, err_msg=k)
        fa = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_a)}
        fb = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_b)}
        assert fa.keys() == fb.keys()
        for k in fa:
            # f32 stat-association drift only (the two paths reduce the IN
            # sums in different orders, and halo-duplicate cotangents add in
            # a different order before the entry wgrad): observed ≤ 4.4e-6
            # absolute, on near-cancelling elements. A halo-bookkeeping bug
            # would be grad-magnitude absolute errors across whole rows.
            np.testing.assert_allclose(fa[k], fb[k], rtol=1e-3, atol=1e-5, err_msg=k)

    def test_grad_matches_xla_scatter(self):
        """The custom VJP (training path!) must match XLA's scatter grad."""
        import jax
        import jax.numpy as jnp

        from det3d_tpu.kernels.scatter_pallas import scatter_to_bev_pallas

        r = np.random.RandomState(3)
        b, v, c, nx, ny = 2, 24, 8, 8, 16
        feats = jnp.asarray(r.randn(b, v, c).astype(np.float32))
        coors = np.full((b, v, 3), -1, np.int32)
        for bi in range(b):
            cells = r.choice(nx * ny, 20, replace=False)
            coors[bi, :20, 0] = cells // ny
            coors[bi, :20, 1] = cells % ny
            coors[bi, :20, 2] = 0
        coors = jnp.asarray(coors)
        w = jnp.asarray(r.randn(nx, ny, c).astype(np.float32))

        def loss_pallas(f):
            cv = scatter_to_bev_pallas(f, coors, (nx, ny), True)
            return jnp.sum(jnp.tanh(cv) * w)

        def loss_xla(f):
            return jnp.sum(jnp.tanh(scatter_to_bev(f, coors, (nx, ny))) * w)

        gp = jax.grad(loss_pallas)(feats)
        gx = jax.grad(loss_xla)(feats)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-6)
