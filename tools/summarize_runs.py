"""Summarize the unattended TPU measurement chain's outputs in one screen.

The round-3 playbook (/tmp/r3_master.sh and friends) writes bench JSONs,
bench_train logs, the scatter A/B, kernel-check and trace logs under /tmp.
This collects whatever exists into a compact report so the results can be
read (and transcribed into BASELINE.md) at a glance — including after a
session restart where the shell history is gone.

    python tools/summarize_runs.py [--glob-dir /tmp]
"""

import argparse
import json
import re
from pathlib import Path

FILES = {
    # round-4 chain (/tmp/r4a_chain.sh)
    "kernel check": ("r4_kcheck.log", "tail"),
    "bench 20cm (+10cm extra)": ("r4_bench.json", "json"),
    "trace 10cm (top sites)": ("r4_trace_10cm.log", "trace"),
    "trace train (top sites)": ("r4_trace_train.log", "trace"),
    "learning validation lr=1e-3": ("r4_lv_lr1e3.log", "tail"),
    "tune 20cm": ("r4_tune_20cm.log", "tune"),
    "tune 20cm report": ("r4_tune_20cm.json", "json"),
    "tune 10cm": ("r4_tune_10cm.log", "tune"),
    "tune 10cm report": ("r4_tune_10cm.json", "json"),
    # round-4 chain B (/tmp/r4b_chain.sh)
    "kernel check (blocked)": ("r4_kcheck_b.log", "tail"),
    "bench 10cm block0_blocked": ("r4_bench_b0b_10cm.json", "json"),
    "bench 20cm block0_blocked": ("r4_bench_b0b_20cm.json", "json"),
    "learning validation 6000 steps": ("r4_lv6000.log", "tail"),
    "chain progress": ("r4_chain.log", "tail"),
}

TRAIN_RE = re.compile(r"(ms/step|pipelined|==|rc=|loss=)")
TUNE_RE = re.compile(r"(\[infer\]|\[train\]|tuned config|rc=)")


def show(name: str, path: Path, mode: str) -> None:
    if not path.exists():
        print(f"-- {name}: (absent)")
        return
    text = path.read_text(errors="replace")
    print(f"== {name} ({path}, {len(text.splitlines())} lines) ==")
    if mode == "json":
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                    print(json.dumps(d, indent=1)[:2000])
                except json.JSONDecodeError:
                    print(line[:500])
    elif mode == "train":
        for line in text.splitlines():
            if TRAIN_RE.search(line):
                print("  " + line.strip()[:160])
    elif mode == "tune":
        for line in text.splitlines():
            if TUNE_RE.search(line):
                print("  " + line.strip()[:160])
    elif mode == "trace":
        lines = [ln for ln in text.splitlines() if ln.strip()]
        # the per-site totals block starts right after "device total"
        for i, ln in enumerate(lines):
            if "device total" in ln:
                print("\n".join("  " + x for x in lines[i : i + 14]))
                break
        else:
            print("\n".join("  " + x for x in lines[-6:]))
    else:  # tail
        print("\n".join("  " + ln for ln in text.splitlines()[-8:]))
    print()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob-dir", default="/tmp")
    args = ap.parse_args()
    base = Path(args.glob_dir)
    for name, (fname, mode) in FILES.items():
        show(name, base / fname, mode)


if __name__ == "__main__":
    main()
