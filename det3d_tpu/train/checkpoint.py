"""Checkpoint save/restore with the reference's latest+per-step layout.

Counterpart of the reference's torch.save/load cycle (reference:
train.py:69-76, :117-127): a `latest` checkpoint overwritten every save
interval plus an immutable per-step copy, restoring model params, optimizer
state, and step counter. Implemented with orbax.
"""

from __future__ import annotations

import os
import shutil
import uuid
from pathlib import Path

import orbax.checkpoint as ocp

from det3d_tpu.train.trainer import TrainState


class CheckpointManager:
    def __init__(self, model_dir: str | Path, readonly: bool = False):
        """readonly=True opens WITHOUT write-side effects (no mkdir, no
        .tmp.* sweep) — required when another process may be mid-save in the
        same dir (sweeping would delete its in-flight temp and crash it)."""
        self.model_dir = Path(model_dir).absolute()
        self._readonly = readonly
        self._ckpt = ocp.StandardCheckpointer()
        if readonly:
            return
        self.model_dir.mkdir(parents=True, exist_ok=True)
        # sweep temp dirs a crashed previous run may have left behind
        for stale in self.model_dir.glob(".tmp.*"):
            shutil.rmtree(stale, ignore_errors=True)

    def _path(self, name: str) -> Path:
        return self.model_dir / name

    def save(self, state: TrainState) -> None:
        """Write both `latest` and `<step>` checkpoints (reference
        train.py:117-127 writes latest.pth + {step}.pth).

        Atomic: each checkpoint is written to a temp dir, then renamed over
        the target. A crash mid-save never destroys the previous `latest`
        (the old rmtree-then-save left a window with no resume point)."""
        if self._readonly:
            raise RuntimeError("CheckpointManager opened readonly; cannot save")
        step = int(state.step)
        for name in ("latest", str(step)):
            path = self._path(name)
            tmp = self._path(f".tmp.{name}.{uuid.uuid4().hex[:8]}")
            try:
                self._ckpt.save(tmp, state)
                self._ckpt.wait_until_finished()
                if path.exists():
                    # swap: move old aside, new in, drop old — the window
                    # with no `latest` is two renames, not a full write
                    old = self._path(f".tmp.old.{uuid.uuid4().hex[:8]}")
                    os.rename(path, old)
                    os.rename(tmp, path)
                    shutil.rmtree(old, ignore_errors=True)
                else:
                    os.rename(tmp, path)
            finally:
                if tmp.exists():
                    shutil.rmtree(tmp, ignore_errors=True)

    def restore_latest(self, template: TrainState) -> TrainState | None:
        """Resume from `latest` if present (reference train.py:69-76)."""
        path = self._path("latest")
        if not path.exists():
            return None
        restored = self._ckpt.restore(path, template)
        return restored

    def has_latest(self) -> bool:
        return self._path("latest").exists()


def load_latest_state(cfg, model_dir: str | Path, detector=None) -> TrainState:
    """Read-only restore of `latest` into a fresh template — the shared
    checkpoint-load used by every non-training entry point (infer, serve,
    export, torch interop). Opens the dir without write-side effects and
    raises FileNotFoundError when no checkpoint exists."""
    import jax

    from det3d_tpu.train.trainer import Trainer

    mgr = CheckpointManager(model_dir, readonly=True)
    if not mgr.has_latest():
        raise FileNotFoundError(f"no latest checkpoint under {model_dir}")
    template = Trainer(cfg, detector).init_state(jax.random.PRNGKey(0))
    return mgr.restore_latest(template)
