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
    "decode_jpeg",
    "open_rgb",
    "train_augment",
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
        "-o", so, _SRC, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        # no LINKABLE libjpeg on this system: rebuild with the jpeg
        # code compiled out entirely (-DSEGTRON_NO_JPEG — the header
        # alone may still exist, and undefined jpeg_* symbols would
        # make the .so fail dlopen and kill the non-jpeg kernels too).
        # Decode entry points become stubs returning -1 -> PIL fallback.
        try:
            subprocess.run(
                cmd[:-1] + ["-DSEGTRON_NO_JPEG"], check=True,
                capture_output=True, timeout=120,
            )
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
        c_intp = ctypes.POINTER(ctypes.c_int)
        lib.jpeg_dims.argtypes = [u8p, c_int, c_intp, c_intp]
        lib.jpeg_dims.restype = c_int
        lib.decode_jpeg_rgb.argtypes = [u8p, c_int, u8p]
        lib.decode_jpeg_rgb.restype = c_int
        lib.train_augment_u8.argtypes = [
            u8p, c_int, c_int, c_int, c_int, c_int, c_int, c_int, c_int,
            ctypes.c_float, f32p, f32p, f32p,
        ]
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


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """JPEG bytes -> u8 (H, W, 3) RGB via libjpeg (GIL released), or
    None when the native lib / libjpeg is unavailable or parsing fails
    (caller falls back to PIL)."""
    lib = native_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.jpeg_dims(buf, buf.size, ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.decode_jpeg_rgb(buf, buf.size, out.reshape(-1)) != 0:
        return None
    return out


def open_rgb(path: str):
    """Open an image as a PIL RGB image, decoding JPEGs natively
    (libjpeg, outside the GIL) when possible. Returns a PIL Image
    either way so the transform pipeline is unchanged."""
    from PIL import Image

    if path.lower().endswith((".jpg", ".jpeg")):
        try:
            with open(path, "rb") as f:
                arr = decode_jpeg(f.read())
        except OSError:
            arr = None
        if arr is not None:
            return Image.fromarray(arr)
    return Image.open(path).convert("RGB")


def train_augment(
    src: np.ndarray,
    flip: bool,
    out_hw,
    crop_yx,
    crop: int,
    blur_sigma: float,
    mean: np.ndarray,
    std: np.ndarray,
) -> Optional[np.ndarray]:
    """Fused train augmentation (native/segtron_host.cpp::
    train_augment_u8): hflip + random-scale resize to ``out_hw`` + pad
    + crop ``crop`` at ``crop_yx`` + gaussian blur + normalize, one
    OpenMP pass. Returns f32 (crop, crop, 3), or None without the
    native lib."""
    lib = native_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    oh, ow = out_hw
    y1, x1 = crop_yx
    out = np.empty((crop, crop, 3), np.float32)
    lib.train_augment_u8(
        src, src.shape[0], src.shape[1], int(flip), int(oh), int(ow),
        int(y1), int(x1), int(crop), float(blur_sigma),
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32), out,
    )
    return out


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
