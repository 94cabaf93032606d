"""Torch checkpoint interop: import from and export to the reference format.

Migration path for users of the reference `1005088h/3d_object_detection`:
their training runs save `{'step', 'model_state_dict', 'optimizer_state_dict'}`
(reference train.py:117-127). `import_torch_checkpoint` converts the model
weights into the Flax parameter tree and writes a framework checkpoint that
every entry point (`cli infer/serve/export --checkpoint`) restores directly;
`export_torch_checkpoint` is the exact inverse — a framework-trained model
ejected as a reference-layout .pth that `net.load_state_dict` accepts
strictly (e.g. to keep an existing TensorRT deployment pipeline).

The Flax modules were designed parameter-compatible with the torch layout
(see DeconvUpsample / RPN / SharedHead docstrings in models/pointpillars.py):
kernels are stored in canonical nn.Dense/nn.Conv shapes and every TPU-side
rearrangement (w-parity packing, [k][anchor] head permutation) happens
weight-side at apply time, so a converted checkpoint is exact — the weights-
transplant parity suite (tests/test_reference_parity.py) asserts forward
agreement with the torch network to atol 2e-4 *through this module*.

Optimizer state IS imported when present: torch Adam's per-parameter moments
(exp_avg / exp_avg_sq) follow the exact same layout transforms as their
weights (they are elementwise companions), so the weight converter doubles
as the moment converter and a migrated run resumes mid-trajectory — the
update-parity test asserts the first post-import step matches torch's to
float32 tolerance. Pass import_optimizer=False to re-warm Adam from zero
instead (the reference's own lr-override-on-restore workflow, train.py:73-76,
tolerates that kind of restart).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor (any device) or array-like → private numpy copy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.array(t, copy=True)


def _conv_k(w) -> np.ndarray:
    """torch Conv2d OIHW → flax HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def _dense_k(w) -> np.ndarray:
    """torch Conv1d/Conv2d 1x1 (O, I, 1[, 1]) → nn.Dense (I, O)."""
    w = _np(w)
    return w.reshape(w.shape[0], w.shape[1]).T


def _deconv_k(w) -> np.ndarray:
    """ConvTranspose2d (I, O, S, S) → DeconvUpsample (S, S, I, O).

    out[s·i+p, s·j+q, o] = Σc in[i,j,c]·W[c,o,p,q]; DeconvUpsample reads
    kernel[s-1-p, s-1-q, c, o] at that tap → flip both spatial axes."""
    return np.flip(_np(w).transpose(2, 3, 0, 1), (0, 1)).copy()


def state_dict_to_variables(sd: dict, layer_nums: tuple[int, ...] = (2, 4, 4)) -> dict:
    """Reference `net.state_dict()` → `{"params", "batch_stats"}` numpy trees.

    `layer_nums` mirrors RPN.layer_nums; the reference block Sequential is
    [conv, IN, relu, Resnet2(1)×(d//2), Resnet2(0)] where Resnet2(1).conv_block
    holds convs at indices 2 and 5 and Resnet2(0).conv_block at index 2
    (reference networks/pointpillars8_shared.py:114-181)."""
    missing = [k for k in ("pillar_point_net.pfn_layers.0.weight",
                           "heads.conv_cls.weight", "rpn.block1.0.weight")
               if k not in sd]
    if missing:
        raise KeyError(
            f"state_dict lacks reference keys {missing} — is this a "
            "model_state_dict from the reference PointPillars trainer?")

    rpn = {}
    for b, depth in enumerate(layer_nums, start=1):
        rpn[f"block{b - 1}_down"] = {"kernel": _conv_k(sd[f"rpn.block{b}.0.weight"])}
        n_full = depth // 2
        units = [(3 + u, 2) for u in range(n_full)] + [(3 + n_full, 1)]
        for u, (seq_idx, n_convs) in enumerate(units):
            convs = {}
            for i in range(n_convs):
                w = sd[f"rpn.block{b}.{seq_idx}.conv_block.{2 + 3 * i}.weight"]
                convs[f"conv{i}"] = {"kernel": _conv_k(w)}
            rpn[f"block{b - 1}_res{u}"] = convs
    # deconv1 is ConvTranspose k=1 s=1 ≡ 1x1 conv with W[i,o] = Wt[i,o,0,0]
    w = _np(sd["rpn.deconv1.0.weight"])
    rpn["deconv0"] = {"kernel": w.transpose(2, 3, 0, 1)}
    rpn["deconv1"] = {"kernel": _deconv_k(sd["rpn.deconv2.0.weight"])}
    rpn["deconv2"] = {"kernel": _deconv_k(sd["rpn.deconv3.0.weight"])}

    params = {
        "pfn": {
            "pfn_dense": {"kernel": _dense_k(sd["pillar_point_net.pfn_layers.0.weight"])},
            "pfn_bn": {
                "scale": _np(sd["pillar_point_net.pfn_layers.1.weight"]),
                "bias": _np(sd["pillar_point_net.pfn_layers.1.bias"]),
            },
        },
        "rpn": rpn,
        "head": {
            name: {
                "kernel": _dense_k(sd[f"heads.{name}.weight"]),
                "bias": _np(sd[f"heads.{name}.bias"]),
            }
            for name in ("conv_cls", "conv_box", "conv_dir")
        },
    }
    batch_stats = {
        "pfn": {
            "pfn_bn": {
                "mean": _np(sd["pillar_point_net.pfn_layers.1.running_mean"]),
                "var": _np(sd["pillar_point_net.pfn_layers.1.running_var"]),
            }
        }
    }
    return {"params": params, "batch_stats": batch_stats}


def variables_to_state_dict(variables: dict, layer_nums: tuple[int, ...] = (2, 4, 4)) -> dict:
    """`{"params", "batch_stats"}` tree → reference `net.state_dict()` keys
    as numpy arrays — the exact inverse of `state_dict_to_variables` (each
    kernel transform is its own inverse up to the documented flips).

    Includes the BatchNorm bookkeeping key (`num_batches_tracked`, zeroed) so
    the result loads with `strict=True`."""
    p, bs = variables["params"], variables["batch_stats"]
    f32 = lambda a: np.ascontiguousarray(_np(a), dtype=np.float32)  # noqa: E731

    sd = {
        # nn.Dense (I, O) → Conv1d (O, I, 1)
        "pillar_point_net.pfn_layers.0.weight": f32(p["pfn"]["pfn_dense"]["kernel"]).T[..., None],
        "pillar_point_net.pfn_layers.1.weight": f32(p["pfn"]["pfn_bn"]["scale"]),
        "pillar_point_net.pfn_layers.1.bias": f32(p["pfn"]["pfn_bn"]["bias"]),
        "pillar_point_net.pfn_layers.1.running_mean": f32(bs["pfn"]["pfn_bn"]["mean"]),
        "pillar_point_net.pfn_layers.1.running_var": f32(bs["pfn"]["pfn_bn"]["var"]),
        "pillar_point_net.pfn_layers.1.num_batches_tracked": np.zeros((), np.int64),
    }
    rpn = p["rpn"]
    for b, depth in enumerate(layer_nums, start=1):
        # flax HWIO → torch OIHW
        sd[f"rpn.block{b}.0.weight"] = f32(rpn[f"block{b - 1}_down"]["kernel"]).transpose(3, 2, 0, 1)
        n_full = depth // 2
        units = [(3 + u, 2) for u in range(n_full)] + [(3 + n_full, 1)]
        for u, (seq_idx, n_convs) in enumerate(units):
            for i in range(n_convs):
                sd[f"rpn.block{b}.{seq_idx}.conv_block.{2 + 3 * i}.weight"] = f32(
                    rpn[f"block{b - 1}_res{u}"][f"conv{i}"]["kernel"]
                ).transpose(3, 2, 0, 1)
    sd["rpn.deconv1.0.weight"] = f32(rpn["deconv0"]["kernel"]).transpose(2, 3, 0, 1)
    sd["rpn.deconv2.0.weight"] = np.flip(f32(rpn["deconv1"]["kernel"]), (0, 1)).transpose(2, 3, 0, 1)
    sd["rpn.deconv3.0.weight"] = np.flip(f32(rpn["deconv2"]["kernel"]), (0, 1)).transpose(2, 3, 0, 1)
    for name in ("conv_cls", "conv_box", "conv_dir"):
        # nn.Dense (I, O) → Conv2d 1x1 (O, I, 1, 1)
        sd[f"heads.{name}.weight"] = f32(p["head"][name]["kernel"]).T[..., None, None]
        sd[f"heads.{name}.bias"] = f32(p["head"][name]["bias"])
    return {k: np.ascontiguousarray(v) for k, v in sd.items()}


def export_torch_checkpoint(model_dir: str | Path, cfg, out_path: str | Path) -> int:
    """Eject the `latest` framework checkpoint as a reference-layout .pth.

    Returns the exported step. The optimizer_state_dict is always a VALID
    torch Adam state dict — the reference's resume calls
    `optimizer.load_state_dict(checkpoint['optimizer_state_dict'])`
    unconditionally (train.py:70-72), so an empty dict would crash it there.
    When the checkpoint carries stepped Adam moments they transfer (the
    moment trees map through the same transforms as their weights); a fresh
    optimizer exports as `{'state': {}, 'param_groups': [...]}`."""
    import jax
    import torch

    from det3d_tpu.train.checkpoint import load_latest_state

    state = load_latest_state(cfg, model_dir)
    np_vars = {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    }
    sd = variables_to_state_dict(np_vars)
    n_params = sum(1 for k in sd if not k.endswith(_BUFFER_SUFFIXES))

    inj = state.opt_state[1]
    adam_s = inj.inner_state[0]
    adam_step = int(adam_s.count)
    torch_state: dict = {}
    if adam_step > 0:
        mu, nu = adam_s.mu, adam_s.nu
        zeros_bs = jax.tree.map(np.zeros_like, np_vars["batch_stats"])
        mu_sd = variables_to_state_dict({"params": jax.tree.map(np.asarray, mu),
                                         "batch_stats": zeros_bs})
        nu_sd = variables_to_state_dict({"params": jax.tree.map(np.asarray, nu),
                                         "batch_stats": zeros_bs})
        # indices must follow torch's parameters() (module-registration)
        # order, which interleaves deconvs between blocks — NOT this module's
        # dict insertion order
        for i, k in enumerate(reference_param_key_order()):
            torch_state[i] = {
                "step": torch.tensor(float(adam_step)),
                "exp_avg": torch.from_numpy(mu_sd[k]),
                "exp_avg_sq": torch.from_numpy(nu_sd[k]),
            }
    lr = float(np.asarray(inj.hyperparams["learning_rate"]))
    opt_sd = {
        "state": torch_state,
        "param_groups": [{
            "lr": lr, "betas": (0.9, 0.999), "eps": 1e-8, "weight_decay": 0,
            "amsgrad": False, "maximize": False, "foreach": None,
            "capturable": False, "differentiable": False, "fused": None,
            "params": list(range(n_params)),
        }],
    }
    torch.save(
        {
            "step": int(state.step),
            "model_state_dict": {k: torch.from_numpy(v) for k, v in sd.items()},
            "optimizer_state_dict": opt_sd,
        },
        str(out_path),
    )
    return int(state.step)


_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def reference_param_key_order(layer_nums: tuple[int, ...] = (2, 4, 4)) -> list[str]:
    """The reference net's PARAMETER keys in module-registration order —
    which is `net.parameters()` order and therefore torch Adam's state-index
    order (pointpillars8_shared.py registers block1, deconv1, block2,
    deconv2, block3, deconv3, then SharedHead's conv_cls/box/dir)."""
    keys = [
        "pillar_point_net.pfn_layers.0.weight",
        "pillar_point_net.pfn_layers.1.weight",
        "pillar_point_net.pfn_layers.1.bias",
    ]
    for b, depth in enumerate(layer_nums, start=1):
        keys.append(f"rpn.block{b}.0.weight")
        n_full = depth // 2
        units = [(3 + u, 2) for u in range(n_full)] + [(3 + n_full, 1)]
        for seq_idx, n_convs in units:
            for i in range(n_convs):
                keys.append(f"rpn.block{b}.{seq_idx}.conv_block.{2 + 3 * i}.weight")
        keys.append(f"rpn.deconv{b}.0.weight")
    for name in ("conv_cls", "conv_box", "conv_dir"):
        keys.append(f"heads.{name}.weight")
        keys.append(f"heads.{name}.bias")
    return keys


def optimizer_state_to_moments(
    opt_sd: dict, model_sd: dict, layer_nums: tuple[int, ...] = (2, 4, 4)
) -> tuple[int, dict, dict]:
    """torch Adam `optimizer_state_dict` → (adam_step, mu_tree, nu_tree).

    torch keys Adam state by parameter INDEX in `net.parameters()` order,
    which equals the state_dict's parameter-key order (both are module
    registration order); each moment tensor has its weight's shape, so the
    weight converter maps the moment trees. Shape equality is asserted
    per-parameter, which catches any ordering violation."""
    param_keys = [k for k in model_sd if not k.endswith(_BUFFER_SUFFIXES)]
    idxs = list(opt_sd["param_groups"][0]["params"])
    if len(idxs) != len(param_keys):
        raise ValueError(
            f"optimizer state has {len(idxs)} parameters, model has "
            f"{len(param_keys)} — not a matching reference checkpoint")
    torch_state = opt_sd["state"]
    step = 0
    ea: dict[str, np.ndarray] = {}
    es: dict[str, np.ndarray] = {}
    missing: list[str] = []
    for key, idx in zip(param_keys, idxs):
        s = torch_state.get(idx, torch_state.get(str(idx)))
        w = _np(model_sd[key])
        if s is None:  # parameter never stepped (grads were None)
            missing.append(key)
            ea[key] = np.zeros_like(w, dtype=np.float32)
            es[key] = np.zeros_like(w, dtype=np.float32)
            continue
        m, v = _np(s["exp_avg"]), _np(s["exp_avg_sq"])
        if m.shape != w.shape:
            raise ValueError(
                f"moment shape {m.shape} != weight shape {w.shape} for {key} "
                "— torch parameter order assumption violated")
        ea[key], es[key] = m, v
        this_step = int(np.asarray(_np(s["step"])).item())
        if step not in (0, this_step):
            # optax keeps ONE bias-correction count for the whole tree; torch
            # keeps one per parameter. Divergent counts (a parameter whose
            # grads were None for part of training) cannot be represented —
            # importing would silently mis-correct. Fail loudly; the user can
            # re-import with import_optimizer=False.
            raise ValueError(
                f"per-parameter Adam step counts differ ({step} vs {this_step} "
                f"at {key}); cannot represent in a single optax count — "
                "re-run with --no-optimizer to import weights only")
        step = this_step
    if missing and len(missing) < len(param_keys):
        # fresh params would start at torch step 1 while the shared optax
        # count is already large — unrepresentable, same as divergent counts
        raise ValueError(
            f"Adam state missing for {missing[:3]}{'…' if len(missing) > 3 else ''} "
            "while other parameters have stepped — cannot represent in a "
            "single optax count; re-run with --no-optimizer")
    for k in model_sd:  # zero stand-ins so the tree builder sees its full key set
        if k.endswith(_BUFFER_SUFFIXES):
            ea[k] = np.zeros_like(_np(model_sd[k]), dtype=np.float32)
            es[k] = np.zeros_like(_np(model_sd[k]), dtype=np.float32)
    mu = state_dict_to_variables(ea, layer_nums)["params"]
    nu = state_dict_to_variables(es, layer_nums)["params"]
    return step, mu, nu


def _splice_adam_state(state, adam_step: int, mu, nu):
    """Write imported Adam moments into a TrainState's optax chain
    (clip_by_global_norm → inject_hyperparams(adam))."""
    import jax
    import jax.numpy as jnp

    clip_s, inj = state.opt_state
    adam_s = inj.inner_state[0]
    tail = tuple(inj.inner_state[1:])
    cast = lambda tmpl, new: jax.tree.map(  # noqa: E731
        lambda t, n: jnp.asarray(n, t.dtype).reshape(t.shape), tmpl, new)
    new_adam = adam_s._replace(
        count=jnp.asarray(adam_step, adam_s.count.dtype),
        mu=cast(adam_s.mu, mu),
        nu=cast(adam_s.nu, nu),
    )
    new_inj = inj._replace(
        count=jnp.asarray(adam_step, inj.count.dtype),
        inner_state=(new_adam,) + tail,
    )
    return state._replace(opt_state=(clip_s, new_inj))


def load_reference_checkpoint(path: str | Path) -> tuple[dict, int, dict | None]:
    """Read a reference .pth file → (model state_dict, step, optimizer sd).

    Accepts both the trainer's full dict (train.py:117-127) and a bare
    `net.state_dict()` (optimizer part None)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError("importing a .pth checkpoint requires torch "
                          "(CPU build is sufficient)") from e
    try:
        ckpt = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        # older reference checkpoints can carry non-tensor pickle objects in
        # optimizer_state_dict; fall back to a full unpickle (user's own file)
        ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        opt_sd = ckpt.get("optimizer_state_dict") or None
        if opt_sd is not None and not opt_sd.get("state"):
            opt_sd = None  # present but empty: nothing to import
        return ckpt["model_state_dict"], int(ckpt.get("step", 0)), opt_sd
    return ckpt, 0, None


def import_torch_checkpoint(
    ckpt_path: str | Path, cfg, model_dir: str | Path, import_optimizer: bool = True
) -> int:
    """Convert a reference checkpoint into `model_dir` (framework layout).

    Returns the imported step. The result restores through
    `CheckpointManager.restore_latest` like any native checkpoint; when the
    .pth carries Adam state (and import_optimizer), the moments transfer too
    and training resumes mid-trajectory."""
    import jax
    import jax.numpy as jnp

    from det3d_tpu.train.checkpoint import CheckpointManager
    from det3d_tpu.train.trainer import Trainer

    sd, step, opt_sd = load_reference_checkpoint(ckpt_path)
    imported = state_dict_to_variables(sd)

    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    # the imported trees must match the model's exactly — a geometry/config
    # mismatch should fail loudly here, not as NaNs at inference
    def check_and_cast(template_tree, new_tree, label):
        t_paths = {jax.tree_util.keystr(p): v.shape
                   for p, v in jax.tree_util.tree_leaves_with_path(template_tree)}
        n_paths = {jax.tree_util.keystr(p): v.shape
                   for p, v in jax.tree_util.tree_leaves_with_path(new_tree)}
        if t_paths.keys() != n_paths.keys():
            only_t = sorted(t_paths.keys() - n_paths.keys())
            only_n = sorted(n_paths.keys() - t_paths.keys())
            raise ValueError(f"{label} tree mismatch: model-only {only_t}, "
                             f"checkpoint-only {only_n}")
        bad = [(k, t_paths[k], n_paths[k]) for k in t_paths if t_paths[k] != n_paths[k]]
        if bad:
            raise ValueError(f"{label} shape mismatch (model vs checkpoint): {bad} "
                             "— wrong --config for this .pth?")
        return jax.tree.map(lambda t, n: jnp.asarray(n, t.dtype), template_tree, new_tree)

    state = state._replace(
        step=jnp.asarray(step, jnp.int32),
        params=check_and_cast(state.params, imported["params"], "params"),
        batch_stats=check_and_cast(state.batch_stats, imported["batch_stats"], "batch_stats"),
    )
    if import_optimizer and opt_sd is not None:
        adam_step, mu, nu = optimizer_state_to_moments(opt_sd, sd)
        state = _splice_adam_state(state, adam_step, mu, nu)
    CheckpointManager(model_dir).save(state)
    return step
