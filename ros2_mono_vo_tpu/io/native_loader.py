"""ctypes bindings for the native C++ frame loader (native/frame_loader.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, hence the plain C ABI). Falls back to cv2 decode if the build or a
decode fails, so the engine never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "frame_loader.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libframe_loader.so")
_build_lock = threading.Lock()
_lib = None


def _ensure_built() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                   "-o", _LIB, "-lz", "-lpthread"]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                import logging
                logging.getLogger("mono_vo.io").warning(
                    "native frame_loader build failed (%s); falling back to cv2",
                    e)
                return None
        lib = ctypes.CDLL(_LIB)
        lib.fl_open.restype = ctypes.c_void_p
        lib.fl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                                ctypes.c_int, ctypes.c_int]
        lib.fl_next.restype = ctypes.c_int
        lib.fl_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_int), ctypes.c_long]
        lib.fl_close.argtypes = [ctypes.c_void_p]
        lib.fl_decode.restype = ctypes.c_int
        lib.fl_decode.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int), ctypes.c_long]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _ensure_built() is not None


def decode_png(path: str, max_pixels: int = 8 << 20) -> np.ndarray | None:
    """Decode one PNG to grayscale float32 via the native decoder.

    Returns None on failure (caller falls back to cv2)."""
    lib = _ensure_built()
    if lib is None:
        return None
    buf = np.empty(max_pixels, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.fl_decode(path.encode(), buf.ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)), ctypes.byref(h), ctypes.byref(w),
        max_pixels)
    if rc != 0:
        return None
    return buf[:h.value * w.value].reshape(h.value, w.value).copy()


class PrefetchingLoader:
    """Threaded read-ahead over a list of PNG paths.

    Decode runs in native worker threads while the consumer (device feed)
    drains frames in order — the double-buffered host I/O pipeline of
    SURVEY.md section 7 stage 6.
    """

    def __init__(self, paths: list[str], ring: int = 8, threads: int = 4,
                 max_pixels: int = 8 << 20):
        lib = _ensure_built()
        if lib is None:
            raise RuntimeError("native frame loader unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.fl_open(arr, len(self._paths), ring, threads)
        self._max_pixels = max_pixels
        self._n = len(paths)

    def __len__(self):
        return self._n

    def __iter__(self):
        buf = np.empty(self._max_pixels, np.float32)
        h = ctypes.c_int()
        w = ctypes.c_int()
        while True:
            rc = self._lib.fl_next(
                self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(h), ctypes.byref(w), self._max_pixels)
            if rc == 1:
                return
            if rc != 0:
                raise RuntimeError("native decode failed mid-sequence")
            yield buf[:h.value * w.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._handle:
            self._lib.fl_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
