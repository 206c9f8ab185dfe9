"""ctypes bindings + lazy build of the native data-loading pipeline.

The C++ library (native/dataloader.cpp) does PNG decode, gamma/vignette
correction, and undistortion remap on a prefetching worker pool — the
runtime role the reference fills with its C++ DatasetReader/Undistort
stack. Falls back gracefully (callers check `available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB = None
_TRIED = False


def _root() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_root(), "libdmvio_native.so")
    src = os.path.join(_root(), "dataloader.cpp")
    stale = (os.path.exists(so) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(so))
    if not os.path.exists(so) or stale:
        try:
            subprocess.run(["make", "-C", _root(), "-B"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(so):
                return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int]
    lib.dl_next.restype = ctypes.c_int
    lib.dl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    lib.dl_decode_png.restype = ctypes.c_int
    lib.dl_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_png(path: str, max_w: int = 4096,
               max_h: int = 4096) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty((max_h * max_w,), np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ok = lib.dl_decode_png(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_w, max_h, ctypes.byref(w), ctypes.byref(h))
    if not ok:
        return None
    return out[:h.value * w.value].reshape(h.value, w.value).copy()


class NativeLoader:
    """Prefetching frame pipeline over a list of image paths."""

    def __init__(self, paths: List[str], in_size, out_size,
                 remap_x: np.ndarray, remap_y: np.ndarray,
                 gamma_lut: Optional[np.ndarray] = None,
                 vignette: Optional[np.ndarray] = None,
                 n_threads: int = 4, ring: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native dataloader unavailable")
        self._lib = lib
        self.out_w, self.out_h = out_size
        self._paths_buf = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(paths))(*self._paths_buf)
        fp = ctypes.POINTER(ctypes.c_float)
        self._rx = np.ascontiguousarray(remap_x, np.float32)
        self._ry = np.ascontiguousarray(remap_y, np.float32)
        self._g = (np.ascontiguousarray(gamma_lut, np.float32)
                   if gamma_lut is not None else None)
        self._v = (np.ascontiguousarray(vignette, np.float32)
                   if vignette is not None else None)
        self._h = lib.dl_create(
            arr, len(paths), in_size[0], in_size[1],
            self.out_w, self.out_h,
            self._rx.ctypes.data_as(fp), self._ry.ctypes.data_as(fp),
            self._g.ctypes.data_as(fp) if self._g is not None else None,
            self._v.ctypes.data_as(fp) if self._v is not None else None,
            n_threads, ring)

    def next(self) -> Optional[np.ndarray]:
        out = np.empty((self.out_h, self.out_w), np.float32)
        ok = self._lib.dl_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out if ok else None

    def close(self):
        if self._h:
            self._lib.dl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
