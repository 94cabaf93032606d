"""Checkpoint save/restore with the reference's latest+per-step layout.

Counterpart of the reference's torch.save/load cycle (reference:
train.py:69-76, :117-127): a `latest` checkpoint overwritten every save
interval plus an immutable per-step copy, restoring model params, optimizer
state, and step counter. Implemented with orbax.
"""

from __future__ import annotations

from pathlib import Path

import orbax.checkpoint as ocp

from det3d_tpu.train.trainer import TrainState


class CheckpointManager:
    def __init__(self, model_dir: str | Path):
        self.model_dir = Path(model_dir).absolute()
        self.model_dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str) -> Path:
        return self.model_dir / name

    def save(self, state: TrainState) -> None:
        """Write both `latest` and `<step>` checkpoints (reference
        train.py:117-127 writes latest.pth + {step}.pth)."""
        step = int(state.step)
        for name in ("latest", str(step)):
            path = self._path(name)
            if path.exists():
                # orbax refuses to overwrite; replace atomically-ish
                import shutil

                shutil.rmtree(path)
            self._ckpt.save(path, state)
        self._ckpt.wait_until_finished()

    def restore_latest(self, template: TrainState) -> TrainState | None:
        """Resume from `latest` if present (reference train.py:69-76)."""
        path = self._path("latest")
        if not path.exists():
            return None
        restored = self._ckpt.restore(path, template)
        return restored

    def has_latest(self) -> bool:
        return self._path("latest").exists()
