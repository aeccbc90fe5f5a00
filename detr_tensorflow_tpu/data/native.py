"""ctypes bindings for the native host data-plane (native/image_ops.cpp).

The library is compiled on first use with g++ (no pybind11 — pure C ABI
via ctypes) and cached next to the source. Every entry point has a numpy
fallback, so the pipeline works even without a toolchain; equivalence is
tested in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from .processing import CAFFE_MEAN, IMAGENET_MEAN, IMAGENET_STD

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "image_ops.cpp"))
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libimage_ops.so"))
    if not os.path.exists(src):
        return None
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.normalize_torch_u8.argtypes = [u8p, f32p, ctypes.c_int64, f32p, f32p]
    lib.normalize_caffe_u8.argtypes = [u8p, f32p, ctypes.c_int64, f32p]
    lib.normalize_torch_u8_into_bucket.argtypes = [
        u8p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
    return _LIB


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def normalize_torch(image_u8: np.ndarray) -> Optional[np.ndarray]:
    """Fused (x/255 - mean)/std for HWC uint8 RGB; None if lib missing."""
    lib = get_lib()
    if lib is None or image_u8.dtype != np.uint8 or image_u8.shape[-1] != 3:
        return None
    image_u8 = np.ascontiguousarray(image_u8)
    out = np.empty(image_u8.shape, np.float32)
    n = image_u8.size // 3
    lib.normalize_torch_u8(
        _ptr(image_u8, ctypes.c_uint8), _ptr(out, ctypes.c_float),
        ctypes.c_int64(n), _ptr(IMAGENET_MEAN, ctypes.c_float),
        _ptr(IMAGENET_STD, ctypes.c_float),
    )
    return out


def normalize_caffe(image_u8: np.ndarray) -> Optional[np.ndarray]:
    """Fused RGB->BGR + caffe mean subtraction; None if lib missing."""
    lib = get_lib()
    if lib is None or image_u8.dtype != np.uint8 or image_u8.shape[-1] != 3:
        return None
    image_u8 = np.ascontiguousarray(image_u8)
    out = np.empty(image_u8.shape, np.float32)
    n = image_u8.size // 3
    lib.normalize_caffe_u8(
        _ptr(image_u8, ctypes.c_uint8), _ptr(out, ctypes.c_float),
        ctypes.c_int64(n), _ptr(CAFFE_MEAN, ctypes.c_float),
    )
    return out


def normalize_torch_into_bucket(
    image_u8: np.ndarray, pad_h: int, pad_w: int
) -> Optional[np.ndarray]:
    """Fused normalize + zero-padded placement into a (pad_h, pad_w, 3)
    bucket buffer (single pass instead of normalize-then-copy)."""
    lib = get_lib()
    if lib is None or image_u8.dtype != np.uint8 or image_u8.shape[-1] != 3:
        return None
    h, w = image_u8.shape[:2]
    image_u8 = np.ascontiguousarray(image_u8)
    out = np.empty((pad_h, pad_w, 3), np.float32)
    lib.normalize_torch_u8_into_bucket(
        _ptr(image_u8, ctypes.c_uint8), _ptr(out, ctypes.c_float),
        h, w, pad_h, pad_w,
        _ptr(IMAGENET_MEAN, ctypes.c_float), _ptr(IMAGENET_STD, ctypes.c_float),
    )
    return out
