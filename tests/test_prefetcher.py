"""Multiprocessing batch prefetcher (data/prefetcher.py)."""

import numpy as np
import pytest

from det3d_tpu.data.prefetcher import BatchPrefetcher
from helpers import small_cfg


class FakeDataset:
    """Minimal dataset double: deterministic points per index, rng-dependent
    'augmentation' so reproducibility across worker counts is observable."""

    def __init__(self, n=12):
        self.n = n
        self.rng = np.random.RandomState(0)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        pts = np.full((50, 4), float(i), np.float32)
        pts[:, 3] = self.rng.rand(50)  # rng-dependent channel
        return {
            "points": pts,
            "gt_boxes": np.array([[float(i), 0, -1.5, 4, 2, 1.6, 0.0]], np.float32),
            "gt_classes": np.array([1], np.int32),
        }


def _collect(num_workers, n_batches=4, seed=3):
    cfg = small_cfg(batch_size=3)
    with BatchPrefetcher(FakeDataset(), cfg, num_workers, seed=seed) as pf:
        out = []
        for b in pf.epochs():
            out.append(b)
            if len(out) == n_batches:
                break
        return out


def test_batches_have_static_shapes_and_cover_epoch():
    cfg = small_cfg(batch_size=3)
    batches = _collect(0, n_batches=4)
    ids = set()
    for b in batches:
        assert b.points.shape == (3, cfg.max_points, 4)
        assert b.gt_valid[:, 0].all()  # one real gt per sample
        ids.update(b.points[:, 0, 0].astype(int).tolist())
    assert len(ids) == 12  # full epoch covered exactly once


def test_workers_match_inline_loading():
    a = _collect(0)
    b = _collect(2)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba.points, bb.points)
        np.testing.assert_array_equal(ba.gt_boxes, bb.gt_boxes)


def test_dataset_smaller_than_batch_errors_not_hangs():
    """len(dataset) < batch_size yields zero full batches per epoch; the
    endless-epochs iterator must raise instead of spinning forever."""
    cfg = small_cfg(batch_size=4)
    with BatchPrefetcher(FakeDataset(n=3), cfg, 0, seed=0) as pf:
        with pytest.raises(ValueError, match="no full batches"):
            next(pf.epochs())


def test_epochs_reshuffle():
    cfg = small_cfg(batch_size=3)
    with BatchPrefetcher(FakeDataset(), cfg, 0, seed=1) as pf:
        it = pf.epochs()
        e1 = [next(it).points[:, 0, 0].astype(int).tolist() for _ in range(4)]
        e2 = [next(it).points[:, 0, 0].astype(int).tolist() for _ in range(4)]
    assert sorted(sum(e1, [])) == sorted(sum(e2, []))
    assert e1 != e2
