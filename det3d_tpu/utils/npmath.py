"""Shared numpy math helpers for host-side modules (jax-free by design —
create_info and the data plane run in plain CPU processes)."""

from __future__ import annotations

import numpy as np


def limit_period_np(val, offset: float, period: float):
    """Wrap `val` into [-offset·period, (1-offset)·period).

    No defaults on purpose: the codebase uses BOTH period=π (rotation-class
    folding, anchors) and period=2π (yaw wrapping, labels/augmentation), and
    grabbing the wrong one aliases headings that differ by π — the exact
    hazard that destroys direction targets (see trainer._device_augment_one).
    Host twin of ops.geometry.limit_period; reference box_np_ops.limit_period."""
    return val - np.floor(val / period + offset) * period
