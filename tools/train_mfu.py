"""Per-conv/per-pass MFU attribution of the training step (VERDICT r4 #3).

Extends trace_train.py's per-source timing with achieved-TF/s per flop
site: the compiled HLO is parsed for every `convolution` / `dot`
instruction (including those inside fusions), each gets an analytic FLOP
count from its shapes, and the profiler's per-op device times turn that
into achieved TF/s per site and per pass (fwd / dgrad / wgrad — classified
from the op_name metadata and output-shape structure).

This answers WHY the train step's conv+matmul rows sit at ~37% of the
197 TF/s bf16 floor (BASELINE.md roofline): which pass is slow, at which
site, and whether the cause is layout (im2col emitter), accumulation
dtype, or fused epilogues.

Usage (TPU): python tools/train_mfu.py [--config configs/ntusl_20cm.json]
Parse smoke (CPU): python tools/train_mfu.py --platform cpu --parse-only
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SHAPE_RE = r"(?:bf16|f16|f32|f64|s8|u8|s16|u16|s32|u32|s64|u64|pred)\[([0-9,]*)\]"


def _dims(s: str) -> list[int]:
    return [int(x) for x in s.split(",") if x] or [1]


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= x
    return out


def parse_flops(hlo: str):
    """Map top-level instruction name → (flops, [site descriptions]).

    Instructions inside a fused computation are credited to the fusion
    instruction that calls it (trace events are named by top-level ops).
    Operands are referenced by name (no inline shapes), so shapes resolve
    through a first-pass name → shape map.
    """
    lines = hlo.splitlines()
    shape_of: dict[str, str] = {}
    for line in lines:
        im = re.match(r"^\s*(?:ROOT )?%?([\w.\-]+) = " + SHAPE_RE, line)
        if im:
            shape_of.setdefault(im.group(1), im.group(2))
        pm = re.match(r"^\s*%?([\w.\-]+) = \(", line)  # tuple-shaped defs skipped
        del pm
    # computation params: "%name (p0: f32[..], p1: s32[..]) -> ... {"
    for line in lines:
        for pm in re.finditer(r"([\w.\-]+): " + SHAPE_RE, line):
            shape_of.setdefault(pm.group(1), pm.group(2))

    comp_of_instr: dict[str, str] = {}
    calls: dict[str, str] = {}
    cur_comp = None
    flop_instrs = []
    for line in lines:
        stripped = line.strip()
        hm = re.match(r"^(?:ENTRY )?%?([\w.\-]+) \(", stripped)
        if hm and stripped.endswith("{") and " = " not in stripped.split("(")[0]:
            cur_comp = hm.group(1)
            continue
        im = re.match(r"^\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if not im:
            continue
        name = im.group(1)
        comp_of_instr[name] = cur_comp
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if " fusion(" in line and cm:
            calls[name] = cm.group(1)
        flops, desc = _line_flops(line, shape_of)
        if flops:
            flop_instrs.append((name, cur_comp, flops, desc))

    comp_to_fusion = {c: f for f, c in calls.items()}
    out: dict[str, tuple[int, list]] = {}
    for name, comp, flops, desc in flop_instrs:
        top = comp_to_fusion.get(comp, name)
        f0, d0 = out.get(top, (0, []))
        out[top] = (f0 + flops, d0 + [desc])
    return out


def _operand_dims(line: str, opcode: str, shape_of: dict):
    """Dims of each operand of `opcode(...)` in the line, resolved by name."""
    args = line[line.index(opcode + "(") + len(opcode) + 1 :]
    depth, end = 1, 0
    for i, ch in enumerate(args):
        depth += ch == "("
        depth -= ch == ")"
        if depth == 0:
            end = i
            break
    names = re.findall(r"%([\w.\-]+)", args[:end])
    inline = re.findall(SHAPE_RE, args[:end])
    if inline and len(inline) == len(names):
        return [_dims(s) for s in inline]
    return [_dims(shape_of[n]) if n in shape_of else None for n in names]


def _line_flops(line: str, shape_of: dict):
    """FLOPs + description for a convolution/dot HLO line (0 if neither)."""
    out_m = re.search(r"= " + SHAPE_RE, line)
    if not out_m:
        return 0, None
    out_dims = _dims(out_m.group(1))
    src = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
    opn = re.search(r'op_name="([^"]+)"', line)
    op_name = opn.group(1) if opn else ""
    if src:
        site = f"{src.group(1).split('/')[-1]}:{src.group(2)}"
    else:
        # compact tail of the jaxpr path, e.g. jvp(PointPillars)/rpn/block0…
        site = "/".join(op_name.split("/")[-3:]) if op_name else "?"

    if " convolution(" in line:
        ops = _operand_dims(line, "convolution", shape_of)
        dl = re.search(r"dim_labels=(\S+?)_(\S+?)->(\S+?)[,)\s]", line)
        if len(ops) < 2 or ops[1] is None or not dl:
            return 0, None
        rhs_dims = ops[1]
        o_idx = dl.group(2).index("o")
        flops = 2 * _prod(out_dims) * _prod(rhs_dims) // rhs_dims[o_idx]
        # effective-tap correction: XLA rewrites some dots/grads as
        # degenerate convolutions whose window mostly covers padding (e.g.
        # the head dot's dgrad: window 2x400, pad 1_1x399_399 — 800x the
        # useful MACs if padded taps are counted). Scale by the fraction of
        # window taps that land on real (non-pad, non-dilation-zero) input.
        frac = _valid_tap_fraction(line, ops[0], out_dims, dl)
        flops = int(flops * frac)
        cls = _classify_conv(op_name, out_dims, line)
        return flops, (site, cls, f"conv out{out_dims} rhs{rhs_dims}")

    if " dot(" in line:
        ops = _operand_dims(line, "dot", shape_of)
        lc = re.search(r"lhs_contracting_dims=\{([0-9,]*)\}", line)
        if not ops or ops[0] is None or not lc:
            return 0, None
        k = _prod(ops[0][int(i)] for i in lc.group(1).split(",") if i)
        flops = 2 * _prod(out_dims) * k
        cls = "bwd" if "transpose" in op_name else "fwd"
        return flops, (site, f"dot-{cls}", f"dot out{out_dims} K={k}")
    return 0, None


def _valid_tap_fraction(line: str, lhs_dims, out_dims, dl) -> float:
    """Fraction of (output, window-tap) pairs whose tap reads a real input
    element — i.e. not zero-padding and not an lhs-dilation hole. 1.0 for
    ordinary convs (pad ≪ window); ~1/800 for the padded-window forms XLA
    rewrites dot grads into."""
    wm = re.search(r"window=\{([^}]*)\}", line)
    if not wm or lhs_dims is None:
        return 1.0
    w = wm.group(1)

    def vec(key, default, n):
        m = re.search(key + r"=([\dx_\-]+)", w)
        if not m:
            return [default] * n
        return [int(v) for v in m.group(1).split("x")]

    sm = re.search(r"size=([\dx]+)", w)
    if not sm:
        return 1.0
    sizes = [int(v) for v in sm.group(1).split("x")]
    nsp = len(sizes)
    strides = vec("stride", 1, nsp)
    rhs_dil = vec("rhs_dilate", 1, nsp)
    lhs_dil = vec("lhs_dilate", 1, nsp)
    pm = re.search(r"pad=([\d_x\-]+)", w)
    pads = (
        [tuple(int(v) for v in p.split("_")) for p in pm.group(1).split("x")]
        if pm
        else [(0, 0)] * nsp
    )
    # spatial input sizes, in dim_labels order ('0','1',...)
    lhs_spec = dl.group(1)
    sp_in = [lhs_dims[lhs_spec.index(str(i))] for i in range(nsp)]
    out_spec = dl.group(3)
    sp_out = [out_dims[out_spec.index(str(i))] for i in range(nsp)]
    import numpy as _np

    frac = 1.0
    for n, k, s, rd, ld, (lo, _hi), no in zip(
        sp_in, sizes, strides, rhs_dil, lhs_dil, pads, sp_out
    ):
        o = _np.arange(no)[:, None]
        t = _np.arange(k)[None, :]
        p = o * s + t * rd - lo
        span = (n - 1) * ld + 1
        valid = (p >= 0) & (p < span) & (p % ld == 0)
        frac *= valid.mean()
    return frac


def _classify_conv(op_name: str, out_dims, line: str) -> str:
    if "transpose" not in op_name:
        return "fwd"
    # wgrad: output is weight-shaped (tiny leading spatial dims) or the conv
    # carries batch_group_count (XLA's canonical wgrad form)
    if "batch_group_count=" in line and "batch_group_count=1" not in line:
        return "wgrad"
    if len(out_dims) == 4 and out_dims[0] <= 7 and out_dims[1] <= 7:
        return "wgrad"
    return "dgrad"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ntusl_20cm.json")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--parse-only", action="store_true",
                    help="compile + parse (no trace) — CPU smoke")
    ap.add_argument("--set", action="append", default=[],
                    help="config override key=json (lever A/Bs)")
    args = ap.parse_args()

    import jax
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from det3d_tpu.config import load_config
    from det3d_tpu.data.synthetic import sample_scene
    from det3d_tpu.train.trainer import Trainer, host_batch

    if args.parse_only:
        import __graft_entry__ as g

        cfg = g._small_cfg().replace(batch_size=args.batch)
    else:
        import json as _json

        overrides = {}
        for kv in args.set:
            k, _, v = kv.partition("=")
            overrides[k] = _json.loads(v)
        cfg = load_config(args.config, max_points=120_000,
                          batch_size=args.batch, **overrides)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batches = [
        jax.device_put(host_batch(cfg, [sample_scene(cfg, rng) for _ in range(args.batch)]))
        for _ in range(args.steps)
    ]

    hlo = (
        jax.jit(trainer.train_step, donate_argnums=(0,))
        .lower(state, batches[0])
        .compile()
        .as_text()
    )
    flops_of = parse_flops(hlo)
    total_flops = sum(f for f, _ in flops_of.values())
    print(f"analytic step FLOPs: {total_flops / 1e12:.3f} TF "
          f"({len(flops_of)} flop-bearing top-level ops)")

    if args.parse_only:
        agg = collections.Counter()
        for f, descs in flops_of.values():
            for site, cls, _ in descs:
                agg[(site, cls)] += f // len(descs)
        for (site, cls), f in agg.most_common(args.top):
            print(f"{f / 1e9:10.2f} GF  {cls:6s} {site}")
        return

    state, loss, counts = trainer.train_step_jit(state, batches[0])
    jax.block_until_ready(loss)
    trace_dir = tempfile.mkdtemp(prefix="det3d-mfu-trace-")
    jax.profiler.start_trace(trace_dir)
    for b in batches:
        state, loss, counts = trainer.train_step_jit(state, b)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()

    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        t = json.load(f)
    events = t["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur_of = collections.Counter()
    total_us = 0
    for e in events:
        if (
            e.get("ph") == "X"
            and "TPU" in pids.get(e["pid"], "")
            and not e["name"].startswith("jit_")
            and not e["name"].isdigit()
        ):
            dur_of[e["name"]] += e.get("dur", 0)
            total_us += e.get("dur", 0)
    print(f"device total: {total_us / args.steps / 1e3:.2f} ms/step")

    rows = []
    flop_time_us = 0
    for name, (flops, descs) in flops_of.items():
        us = dur_of.get(name, 0)
        if us == 0:
            continue
        flop_time_us += us
        tfs = flops * args.steps / (us * 1e6)  # flops per step / s
        sites = collections.Counter(d[0] for d in descs)
        cls = collections.Counter(d[1] for d in descs)
        rows.append((us / args.steps / 1e3, tfs, flops / 1e9,
                     "+".join(f"{c}×{n}" if n > 1 else c for c, n in cls.items()),
                     "+".join(f"{s}×{n}" if n > 1 else s for s, n in sites.most_common(3)),
                     name))
    rows.sort(reverse=True)
    print(f"flop-bearing ops: {flop_time_us / args.steps / 1e3:.2f} ms/step "
          f"achieving {total_flops * args.steps / (flop_time_us * 1e6):.1f} TF/s overall\n")
    print(f"{'ms/step':>8} {'TF/s':>7} {'GF':>8}  {'pass':28s} site")
    for ms, tfs, gf, cls, sites, name in rows[: args.top]:
        print(f"{ms:8.3f} {tfs:7.1f} {gf:8.2f}  {cls[:28]:28s} {sites}  [{name[:24]}]")

    # per-pass rollup
    per_pass = collections.Counter()
    per_pass_f = collections.Counter()
    for ms, tfs, gf, cls, sites, name in rows:
        key = cls.split("+")[0].split("×")[0]
        per_pass[key] += ms
        per_pass_f[key] += gf
    print("\n-- per-pass rollup --")
    for k, ms in per_pass.most_common():
        print(f"{ms:8.3f} ms  {per_pass_f[k]:8.1f} GF  {per_pass_f[k] / ms:6.1f} TF/s  {k}")
    print(f"(trace: {path})")


if __name__ == "__main__":
    main()
