"""ctypes bindings for the native host data-path kernels.

Auto-builds libfastloader.so with the in-tree Makefile on first import if
the toolchain is available; every entry point has a numpy fallback in
data/ so the framework runs without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libfastloader.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _HERE], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.lidar_histogram.argtypes = [f32p, ctypes.c_int64, f32p]
    lib.decode_depth.argtypes = [u8p, ctypes.c_int64, f32p]
    lib.semantic_convert.argtypes = [u8p, ctypes.c_int64, u8p,
                                     ctypes.c_int, u8p]
    lib.decode_bev_roadlane.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                        f32p]
    lib.crop_to_float.argtypes = [u8p] + [ctypes.c_int64] * 6 + [f32p]
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.png_info_file.argtypes = [ctypes.c_char_p, i64p, i64p, i64p]
    lib.png_decode_file.argtypes = [ctypes.c_char_p, u8p,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int64]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


# ------------------------------------------------------------ fast wrappers

def lidar_histogram(points: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points[:, :4], np.float32)
    out = np.empty((256, 256, 2), np.float32)
    lib.lidar_histogram(pts, pts.shape[0], out)
    return out


def decode_depth(rgb: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    img = np.ascontiguousarray(rgb, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((h, w), np.float32)
    lib.decode_depth(img, h * w, out)
    return out


def semantic_convert(seg: np.ndarray, lut: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(seg, np.uint8)
    lut8 = np.ascontiguousarray(lut, np.uint8)
    out = np.empty_like(arr)
    lib.semantic_convert(arr.ravel(), arr.size, lut8, lut8.size,
                         out.ravel())
    return out


def png_read(path: str, channels: Optional[int] = None) \
        -> Optional[np.ndarray]:
    """Decode a PNG straight into a uint8 HWC array via libpng (no
    Python/cv2 overhead). `channels` forces the output channel count
    (1=gray, 3=RGB, 4=RGBA); None keeps the file's own. Color output is
    RGB (the file's true order — cv2's BGR quirk is NOT emulated).
    Returns None if the native lib is unavailable or decode fails."""
    lib = load()
    if lib is None:
        return None
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    c = ctypes.c_int64()
    enc = os.fsencode(path)
    if lib.png_info_file(enc, ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(c)):
        return None
    ch = int(channels) if channels is not None else int(c.value)
    out = np.empty((h.value, w.value, ch), np.uint8)
    if lib.png_decode_file(enc, out, h.value, w.value, ch):
        return None
    return out[..., 0] if ch == 1 else out


def decode_bev_roadlane(packed: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    img = np.ascontiguousarray(packed, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((2, h, w), np.float32)
    lib.decode_bev_roadlane(img, h, w, out)
    return out
