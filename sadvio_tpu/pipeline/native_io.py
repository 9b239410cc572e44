"""ctypes bindings for the native C++ data-loading runtime.

The reference implements its entire data path in C++ (EUROCGrabber thread +
frame queue, adataprovider.cpp); `native/dataloader.cpp` is the TPU build's
counterpart: CSV parse + stereo/IMU sync + threaded image decode into a
bounded ring buffer.  Python consumes it through a plain C ABI (ctypes --
pybind11 is not available in this environment).

Falls back transparently to the pure-Python EurocProvider when the shared
library is missing; build it with `make -C native`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

from sadvio_tpu.pipeline.synthetic import FrameData

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libsadvio_native.so")


def _load_lib(build_if_missing: bool = True):
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.euroc_open.restype = ctypes.c_void_p
    lib.euroc_open.argtypes = [ctypes.c_char_p]
    lib.euroc_n_frames.restype = ctypes.c_int
    lib.euroc_n_frames.argtypes = [ctypes.c_void_p]
    lib.euroc_next_info.restype = ctypes.c_int
    lib.euroc_next_info.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int)
    ] * 3
    lib.euroc_next_frame.restype = ctypes.c_double
    lib.euroc_next_frame.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.euroc_close.restype = None
    lib.euroc_close.argtypes = [ctypes.c_void_p]
    lib.sadvio_delaunay.restype = ctypes.c_int
    lib.sadvio_delaunay.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    return lib


_CACHED_LIB = None
_LIB_TRIED = False


def shared_lib():
    """Load (once) and return the native library handle, or None."""
    global _CACHED_LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        _CACHED_LIB = _load_lib()
    return _CACHED_LIB


def native_delaunay(pts: np.ndarray) -> Optional[np.ndarray]:
    """2-D Delaunay triangulation via native/delaunay.cpp (Bowyer-Watson).

    pts: (n,2) float. Returns (m,3) int32 triangle indices into pts, or None
    if the native library is unavailable.  Counterpart of the reference's
    cv::Subdiv2D use in Mesher::createMesh2D (mesher.cpp:134-165).
    """
    lib = shared_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, np.float32)
    n = len(p)
    cap = max(4 * n, 16)
    out = np.empty((cap, 3), np.int32)
    m = lib.sadvio_delaunay(p, n, out.reshape(-1), cap)
    if m < 0:  # capacity overflow cannot happen at 4n for a planar set
        return None
    return out[:m].copy()


class NativeEurocProvider:
    """Streams synced stereo+IMU frames from the native prefetching loader."""

    def __init__(self, root: str):
        self.lib = _load_lib()
        if self.lib is None:
            raise RuntimeError("native loader unavailable (build native/)")
        self.handle = self.lib.euroc_open(root.encode())
        if not self.handle:
            raise FileNotFoundError(f"not an EuRoC directory: {root}")

    @property
    def n_frames(self) -> int:
        return self.lib.euroc_n_frames(self.handle)

    def frames(self, max_frames: Optional[int] = None) -> Iterator[FrameData]:
        n = 0
        w = ctypes.c_int()
        h = ctypes.c_int()
        ni = ctypes.c_int()
        while True:
            if not self.lib.euroc_next_info(self.handle, w, h, ni):
                return
            img0 = np.empty((h.value, w.value), np.float32)
            img1 = np.empty((h.value, w.value), np.float32)
            imu = np.empty((max(ni.value, 1), 7), np.float64)
            ts = self.lib.euroc_next_frame(self.handle, img0, img1, imu)
            if ts < 0:
                return
            m = imu[: ni.value]
            # real PNG imagery -> uint8 on the wire (see euroc.py frames())
            yield FrameData(
                ts=float(ts),
                images=np.clip(np.stack([img0, img1]), 0, 255).astype(np.uint8),
                gyr=m[:, 1:4].astype(np.float32),
                acc=m[:, 4:7].astype(np.float32),
                dt=m[:, 0].astype(np.float32),
            )
            n += 1
            if max_frames is not None and n >= max_frames:
                return

    def close(self):
        if self.handle:
            self.lib.euroc_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
