"""ctypes binding for the native async point-cloud loader (runtime/).

The reference feeds training with torch DataLoader worker *processes*
(reference train.py:37-45); here disk IO + pad-to-max + shuffle run in C++
threads (runtime/pointcloud_loader.cc) that overlap with TPU steps, and the
Python side just hands out filled (max_points, C) numpy buffers in submit
order. Builds the .so on first use if the toolchain is present; callers can
fall back to `numpy.fromfile` when `available()` is False.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_RUNTIME_DIR = Path(__file__).resolve().parents[2] / "runtime"
_LIB_PATH = _RUNTIME_DIR / "libpointcloud_loader.so"
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_RUNTIME_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.pcl_create.restype = ctypes.c_void_p
    lib.pcl_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64,
    ]
    lib.pcl_submit.restype = ctypes.c_int
    lib.pcl_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.pcl_next.restype = ctypes.c_int
    lib.pcl_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.pcl_finish.argtypes = [ctypes.c_void_p]
    lib.pcl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class AsyncPointCloudLoader:
    """Submit .bin paths; receive padded (max_points, C) arrays in order.

    Usage:
        with AsyncPointCloudLoader(120_000, 4, num_threads=4) as ld:
            for p in paths: ld.submit(p)
            ld.finish()
            for _ in paths: pts, n = ld.next()
    """

    def __init__(
        self,
        max_points: int,
        num_features: int = 4,
        *,
        queue_depth: int = 8,
        num_threads: int = 4,
        shuffle: bool = False,
        seed: int = 0,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        self._lib = lib
        self.max_points = max_points
        self.num_features = num_features
        self._h = lib.pcl_create(
            max_points, num_features, queue_depth, num_threads, int(shuffle), seed
        )
        self._out = np.empty((max_points, num_features), np.float32)
        self._paths: list[str] = []
        self._consumed = 0

    def submit(self, path: str | Path) -> None:
        rc = self._lib.pcl_submit(self._h, str(path).encode())
        if rc != 0:
            raise RuntimeError(f"submit failed ({rc})")
        self._paths.append(str(path))

    def finish(self) -> None:
        self._lib.pcl_finish(self._h)

    def next(self, *, missing_ok: bool = False) -> tuple[np.ndarray, int] | None:
        """Blocking next frame; None when drained after finish().

        Raises FileNotFoundError for an unreadable file (matching the numpy
        fallback path) unless `missing_ok`, in which case an all-zero frame
        with n=0 is returned."""
        n = ctypes.c_int(0)
        rc = self._lib.pcl_next(
            self._h,
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(n),
        )
        if rc == -1:
            return None
        path = self._paths[self._consumed] if self._consumed < len(self._paths) else "?"
        self._consumed += 1
        if rc == 1 and not missing_ok:
            raise FileNotFoundError(f"native loader could not read {path}")
        if rc not in (0, 1):
            raise RuntimeError(f"next failed ({rc})")
        return self._out.copy(), int(n.value)

    def close(self) -> None:
        if self._h:
            self._lib.pcl_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
