"""ctypes bindings to the native host runtime (native/gndnet_host.cpp).

Provides C++ host-side equivalents of the reference's numba layer
(reference: utils/point_cloud_ops.py, utils/utils.py:198-248,
utils/transform.py, ros_node.py:58-138):

* `voxelize` — the reference's exact sequential voxelizer, including the
  break-on-capacity quirk; used as a host-parity oracle and CPU fallback;
* `segment_cloud_host`, `shift_cloud_host`, `transform_cloud_host`;
* `NativeMailbox` — lock-free latest-value triple buffer for streaming.

The library builds itself with g++ on first use; every entry point degrades
gracefully (`available()` returns False) when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "gndnet_host.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libgndnet_host.so")

_lib = None
_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None

        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

        lib.voxelize.restype = ctypes.c_int
        lib.voxelize.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int, f32p, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, f32p, i32p, i32p, ctypes.c_int,
        ]
        lib.segment_cloud.restype = None
        lib.segment_cloud.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int, f32p, ctypes.c_float,
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, f32p,
        ]
        lib.shift_cloud.restype = None
        lib.shift_cloud.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                    ctypes.c_float]
        lib.transform_cloud.restype = None
        lib.transform_cloud.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                        f64p]
        lib.mailbox_create.restype = ctypes.c_void_p
        lib.mailbox_create.argtypes = [ctypes.c_int64]
        lib.mailbox_destroy.restype = None
        lib.mailbox_destroy.argtypes = [ctypes.c_void_p]
        lib.mailbox_write.restype = ctypes.c_int
        lib.mailbox_write.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64,
                                      ctypes.c_int64]
        lib.mailbox_read_latest.restype = ctypes.c_int64
        lib.mailbox_read_latest.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def voxelize(points: np.ndarray, voxel_size, pc_range, max_points: int,
             max_voxels: int, reverse_index: bool = True,
             reference_break: bool = True):
    """Reference-exact sequential voxelization on the host.

    Returns (voxels, coors, num_points) trimmed to the created voxel count —
    the same dynamic-shape contract as the reference's points_to_voxel
    (utils/point_cloud_ops.py:107-167)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    points = np.ascontiguousarray(points, np.float32)
    n, f = points.shape
    vs = np.asarray(voxel_size, np.float32)
    pr = np.asarray(pc_range, np.float32)
    grid = np.round((pr[3:] - pr[:3]) / vs).astype(np.int64)
    coor_map = np.full(int(grid.prod()), -1, np.int32)
    voxels = np.zeros((max_voxels, max_points, f), np.float32)
    coors = np.zeros((max_voxels, 3), np.int32)
    num_points = np.zeros(max_voxels, np.int32)
    n_vox = lib.voxelize(points, n, f, vs, pr, max_points, max_voxels,
                         int(reverse_index), coor_map, voxels, coors,
                         num_points, int(reference_break))
    return voxels[:n_vox], coors[:n_vox], num_points[:n_vox]


def segment_cloud_host(points: np.ndarray, grid_range, cell: float,
                       elevation: np.ndarray, threshold: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    points = np.ascontiguousarray(points, np.float32)
    elevation = np.ascontiguousarray(elevation, np.float32)
    out = np.empty(points.shape[0], np.float32)
    lib.segment_cloud(points, points.shape[0], points.shape[1],
                      np.asarray(grid_range, np.float32), cell, elevation,
                      elevation.shape[0], elevation.shape[1], threshold, out)
    return out


def shift_cloud_host(points: np.ndarray, dz: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    assert points.dtype == np.float32 and points.flags.c_contiguous
    lib.shift_cloud(points, points.shape[0], points.shape[1], dz)
    return points


def transform_cloud_host(points: np.ndarray, matrix: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    assert points.dtype == np.float32 and points.flags.c_contiguous
    m = np.ascontiguousarray(matrix, np.float64)
    lib.transform_cloud(points, points.shape[0], points.shape[1], m)
    return points


class NativeMailbox:
    """Lock-free latest-value mailbox over fixed-size byte slots.

    Single producer / single consumer; the producer never blocks and the
    consumer always sees the newest published payload (stale payloads are
    overwritten, reproducing the reference's drop-old semantics,
    ros_node.py:132-138, without a lock)."""

    def __init__(self, capacity_bytes: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.capacity = int(capacity_bytes)
        self._handle = lib.mailbox_create(self.capacity)
        self._seq = 0

    def write(self, payload: np.ndarray) -> int:
        """Publish a payload (any dtype/shape, flattened bytes); returns seq."""
        buf = np.ascontiguousarray(payload).view(np.uint8).reshape(-1)
        self._seq += 1
        rc = self._lib.mailbox_write(self._handle, buf, buf.size, self._seq)
        if rc != 0:
            raise ValueError(
                f"payload of {buf.size} bytes exceeds capacity {self.capacity}")
        return self._seq

    def read_latest(self, out: np.ndarray):
        """Copy the newest unseen payload into `out` (uint8, flat).
        Returns (nbytes, seq); nbytes == 0 means nothing new."""
        assert out.dtype == np.uint8 and out.flags.c_contiguous
        seq = ctypes.c_int64(-1)
        n = self._lib.mailbox_read_latest(self._handle, out, out.size,
                                          ctypes.byref(seq))
        return int(n), int(seq.value)

    def close(self):
        if self._handle:
            self._lib.mailbox_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
