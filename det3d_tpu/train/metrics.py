"""Running precision/recall on anchor classification logits during training.

Counterpart of the reference's `Metric` (reference: framework/metrics.py:5-67):
thresholds [0.1, 0.3, 0.5, 0.7], accumulating TP / (TP+FN) and TP / (TP+FP)
over steps, printed every display interval. The per-batch counting runs
on-device (one jit-able function returning the 4 count vectors); accumulation
is a tiny host-side state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

THRESHOLDS = (0.1, 0.3, 0.5, 0.7)


def binary_counts(labels: jax.Array, cls_logits: jax.Array) -> dict[str, jax.Array]:
    """Per-threshold TP/FP/FN counts over anchors with label != -1.

    labels: (B, nch, fx, fy) int32 (or legacy flat (B, A)); cls_logits:
    (B, 1, nch, fx, fy) channel-major (or any shape reshapeable to labels).
    Matches reference framework/metrics.py:54-67."""
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32)).reshape(labels.shape)
    weights = (labels != -1).astype(jnp.float32)
    trues = labels > 0
    falses = labels == 0

    thresholds = jnp.asarray(THRESHOLDS).reshape((-1,) + (1,) * labels.ndim)
    pred_true = scores[None] > thresholds                      # (T, B, ...)
    axes = tuple(range(1, pred_true.ndim))
    tp = jnp.sum(weights[None] * (trues[None] & pred_true), axis=axes)
    fp = jnp.sum(weights[None] * (falses[None] & pred_true), axis=axes)
    fn = jnp.sum(weights[None] * (trues[None] & ~pred_true), axis=axes)
    return {"tp": tp, "fp": fp, "fn": fn}


class RunningMetrics:
    """Host-side accumulator with the reference's update/clear/print surface
    (framework/metrics.py:14-51)."""

    def __init__(self) -> None:
        self.clear()

    def clear(self) -> None:
        n = len(THRESHOLDS)
        self.rec_count = np.zeros(n)
        self.rec_total = np.zeros(n)
        self.prec_count = np.zeros(n)
        self.prec_total = np.zeros(n)

    def update(self, counts: dict) -> None:
        tp = np.asarray(counts["tp"])
        fp = np.asarray(counts["fp"])
        fn = np.asarray(counts["fn"])
        rec = tp + fn
        prec = tp + fp
        upd_r = rec > 0
        upd_p = prec > 0
        self.rec_count[upd_r] += rec[upd_r]
        self.rec_total[upd_r] += tp[upd_r]
        self.prec_count[upd_p] += prec[upd_p]
        self.prec_total[upd_p] += tp[upd_p]

    @property
    def value(self):
        prec = self.prec_total / np.maximum(self.prec_count, 1.0)
        rec = self.rec_total / np.maximum(self.rec_count, 1.0)
        return prec, rec

    def __str__(self) -> str:
        prec, rec = self.value
        return "  ".join(
            "@%.2f prec:%.5f, rec:%.5f" % (t, prec[i], rec[i])
            for i, t in enumerate(THRESHOLDS)
        )
