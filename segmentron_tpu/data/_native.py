"""ctypes binding for the native host-preprocessing kernels
(``native/segtron_host.cpp``).

Compiled on first import with g++ (-O3 -march=native -fopenmp) into a
cached .so next to the source; every entry point has a numpy fallback
so environments without a toolchain keep working. Toggle with env
``SEGMENTRON_NATIVE=0``.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = [
    "native_lib",
    "fused_resize_normalize",
    "resize_nearest_i32",
    "remap_labels",
]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "segtron_host.cpp",
)


def _build() -> Optional[str]:
    # Build into a source-hash-keyed cache path (never committed; see
    # .gitignore *.so): a stale or foreign binary can't be picked up —
    # -march=native output from another machine would SIGILL here.
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:12]
    except OSError:
        return None
    cache_dir = os.environ.get(
        "SEGMENTRON_NATIVE_CACHE",
        os.path.join(os.path.dirname(_SRC), "build"),
    )
    so = os.path.join(cache_dir, f"segtron_host-{digest}.so")
    if os.path.exists(so):
        return so
    os.makedirs(cache_dir, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", so, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def native_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("SEGMENTRON_NATIVE", "1") == "0":
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        c_int = ctypes.c_int
        lib.fused_resize_normalize.argtypes = [
            u8p, c_int, c_int, f32p, c_int, c_int, f32p, f32p,
        ]
        lib.resize_nearest_i32.argtypes = [i32p, c_int, c_int, i32p, c_int, c_int]
        lib.remap_labels_u8.argtypes = [u8p, c_int, i32p, i32p]
        _LIB = lib
        return _LIB


def fused_resize_normalize(
    src: np.ndarray, out_hw, mean: np.ndarray, std: np.ndarray
) -> np.ndarray:
    """u8 (H, W, 3) -> resampled + normalized f32 (h, w, 3)."""
    dh, dw = out_hw
    lib = native_lib()
    src = np.ascontiguousarray(src, np.uint8)
    if lib is not None:
        dst = np.empty((dh, dw, 3), np.float32)
        lib.fused_resize_normalize(
            src, src.shape[0], src.shape[1], dst, dh, dw,
            np.ascontiguousarray(mean, np.float32),
            np.ascontiguousarray(std, np.float32),
        )
        return dst
    # fallback: PIL resample + numpy normalize
    from PIL import Image

    img = Image.fromarray(src).resize((dw, dh), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - mean) / std


def remap_labels(src: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """uint8 raw-label image -> int32 train ids through a 256-entry LUT."""
    src = np.ascontiguousarray(src, np.uint8)
    lut = np.ascontiguousarray(lut, np.int32)
    lib = native_lib()
    if lib is not None:
        dst = np.empty(src.shape, np.int32)
        lib.remap_labels_u8(src.reshape(-1), src.size, lut, dst.reshape(-1))
        return dst
    return lut[src]


def resize_nearest_i32(src: np.ndarray, out_hw) -> np.ndarray:
    dh, dw = out_hw
    src = np.ascontiguousarray(src, np.int32)
    lib = native_lib()
    if lib is not None:
        dst = np.empty((dh, dw), np.int32)
        lib.resize_nearest_i32(src, src.shape[0], src.shape[1], dst, dh, dw)
        return dst
    ys = np.minimum(((np.arange(dh) + 0.5) * src.shape[0] / dh).astype(np.int64),
                    src.shape[0] - 1)
    xs = np.minimum(((np.arange(dw) + 0.5) * src.shape[1] / dw).astype(np.int64),
                    src.shape[1] - 1)
    return src[ys][:, xs]
