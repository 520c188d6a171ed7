"""ctypes bindings for the native host runtime (src/acmmp_native.cpp).

The shared library is built on demand with g++ (one-time, cached next to
the source); every entry point has a pure-numpy fallback in io/, so the
framework works without a toolchain — the native path removes host-side
I/O/resampling from the critical path of large runs. Disable with
ACMMP_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "acmmp_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libacmmp_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
           "-o", _LIB_PATH, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first use; None if unavailable
    or disabled via ACMMP_NO_NATIVE (checked per call so tests can toggle)."""
    global _lib, _build_failed
    if os.environ.get("ACMMP_NO_NATIVE"):
        return None
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.an_read_dmb.restype = ctypes.c_int
        lib.an_read_dmb.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int32),
                                    ctypes.c_void_p]
        lib.an_write_dmb.restype = ctypes.c_int
        lib.an_write_dmb.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                                     ctypes.c_int32, ctypes.c_int32,
                                     ctypes.c_void_p]
        lib.an_write_ply.restype = ctypes.c_int
        lib.an_write_ply.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p]
        lib.an_resize_bilinear_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.an_resize_bilinear_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        _lib = lib
    return _lib


def read_dmb_native(path: str) -> Optional[np.ndarray]:
    """Returns the decoded array, or None to fall through to the numpy
    reader — including on any native read failure, so error semantics
    (FileNotFoundError for a missing file, ValueError for a corrupt one)
    come from io/dmb.py regardless of whether the native lib is built."""
    lib = get_lib()
    if lib is None:
        return None
    header = (ctypes.c_int32 * 4)()
    rc = lib.an_read_dmb(path.encode(), header, None)
    if rc != 0:
        return None
    _, h, w, nb = header[0], header[1], header[2], header[3]
    out = np.empty(h * w * nb, np.float32)
    rc = lib.an_read_dmb(path.encode(), header,
                         out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out.reshape((h, w) if nb == 1 else (h, w, nb))


def write_dmb_native(path: str, arr: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(arr, np.float32)
    if arr.ndim == 2:
        h, w, nb = arr.shape[0], arr.shape[1], 1
    else:
        h, w, nb = arr.shape
    rc = lib.an_write_dmb(path.encode(), h, w, nb,
                          arr.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise IOError(f"{path}: dmb write failed ({rc})")
    return True


def write_ply_native(path: str, pts: np.ndarray, normals: np.ndarray,
                     colors: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    pts = np.ascontiguousarray(pts, np.float32)
    normals = np.ascontiguousarray(normals, np.float32)
    colors = np.ascontiguousarray(colors, np.uint8)
    rc = lib.an_write_ply(path.encode(), pts.shape[0],
                          pts.ctypes.data_as(ctypes.c_void_p),
                          normals.ctypes.data_as(ctypes.c_void_p),
                          colors.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise IOError(f"{path}: ply write failed ({rc})")
    return True


def resize_bilinear_native(img: np.ndarray, dh: int, dw: int) -> Optional[np.ndarray]:
    """Bilinear resize with OpenCV's half-pixel convention; f32 or u8,
    2D or 3D (channels last)."""
    lib = get_lib()
    if lib is None:
        return None
    chans = 1 if img.ndim == 2 else img.shape[2]
    sh, sw = img.shape[0], img.shape[1]
    if img.dtype == np.uint8:
        src = np.ascontiguousarray(img)
        dst = np.empty((dh, dw) if img.ndim == 2 else (dh, dw, chans),
                       np.uint8)
        lib.an_resize_bilinear_u8(src.ctypes.data_as(ctypes.c_void_p), sh, sw,
                                  dst.ctypes.data_as(ctypes.c_void_p), dh, dw,
                                  chans)
        return dst
    src = np.ascontiguousarray(img, np.float32)
    dst = np.empty((dh, dw) if img.ndim == 2 else (dh, dw, chans), np.float32)
    lib.an_resize_bilinear_f32(src.ctypes.data_as(ctypes.c_void_p), sh, sw,
                               dst.ctypes.data_as(ctypes.c_void_p), dh, dw,
                               chans)
    return dst
