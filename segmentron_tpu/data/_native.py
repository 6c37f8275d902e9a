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
    "LazyJpeg",
    "resample_row_window",
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
    # g++ writes its output incrementally: a concurrent process seeing
    # the final path mid-write would dlopen a truncated ELF. Compile to
    # a pid-unique temp name and os.rename (atomic on one filesystem)
    # so the final path only ever holds a complete binary.
    tmp = f"{so}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", tmp, _SRC, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.rename(tmp, so)
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
            os.rename(tmp, so)
            return so
        except Exception:
            try:
                os.remove(tmp)
            except OSError:
                pass
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
        lib.normalize_u8.argtypes = [u8p, c_int, f32p, f32p, f32p]
        lib.remap_labels_u8.argtypes = [u8p, c_int, i32p, i32p]
        c_intp = ctypes.POINTER(ctypes.c_int)
        lib.jpeg_dims.argtypes = [u8p, c_int, c_intp, c_intp]
        lib.jpeg_dims.restype = c_int
        lib.jpeg_scaled_dims.argtypes = [u8p, c_int, c_int, c_intp, c_intp]
        lib.jpeg_scaled_dims.restype = c_int
        lib.decode_jpeg_rgb.argtypes = [u8p, c_int, u8p]
        lib.decode_jpeg_rgb.restype = c_int
        lib.decode_jpeg_rgb_scaled.argtypes = [
            u8p, c_int, c_int, c_int, c_int, c_int, c_int, u8p,
        ]
        lib.decode_jpeg_rgb_scaled.restype = c_int
        lib.train_augment_u8.argtypes = [
            u8p, c_int, c_int, c_int, c_int, c_int, c_int, c_int, c_int,
            c_int, c_int, ctypes.c_float, f32p, f32p, f32p,
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


def normalize_u8(src: np.ndarray, mean: np.ndarray, std: np.ndarray):
    """u8 (H, W, 3) -> `(x/255 - mean)/std` f32, one OpenMP pass,
    bit-identical to the numpy fallback's op order. None without the
    native lib."""
    lib = native_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    out = np.empty(src.shape, np.float32)
    lib.normalize_u8(
        src.reshape(-1), src.shape[0] * src.shape[1],
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32), out.reshape(-1),
    )
    return out


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


class LazyJpeg:
    """An undecoded JPEG for the native train path.

    The train augmentation draws its geometry (random scale, crop)
    BEFORE any pixel is needed, so decoding eagerly at full resolution
    wastes most of the IDCT work whenever the image is scaled down or
    mostly cropped away. This wrapper exposes the header dims
    immediately (so the rng-driven geometry is identical to the eager
    path) and decodes on demand at the smallest libjpeg DCT scale
    (num/8, num=1..8) whose output still covers the resample target,
    restricted to the scanline window the crop actually reads
    (``decode_jpeg_rgb_scaled``). Full-decode cost is O(HW); the
    scaled window decode is O(HW·(num/8)²·rows_used/rows).
    """

    def __init__(self, data: bytes, h: int, w: int):
        self.data = data
        self.h = h
        self.w = w

    @property
    def size(self):  # PIL convention: (width, height)
        return (self.w, self.h)

    def scaled_dims(self, num: int):
        """Output dims of a num/8 decode — libjpeg's ceil(dim*num/8)."""
        return (self.h * num + 7) // 8, (self.w * num + 7) // 8

    def pick_scale(self, oh: int, ow: int) -> int:
        """Smallest PROFITABLE num with scaled dims >= the (oh, ow)
        resample target in BOTH axes (downscale stays antialiased: the
        triangle filter always sees a source at least as large as the
        target). Upscale targets get num=8 (full resolution).

        num is restricted to {1,2,3,4,8}: measured on this host
        (2048x1024 q90, libjpeg-turbo), scaled decode at 5/8..7/8 runs
        the NON-SIMD reduced IDCT and is SLOWER than full decode
        (32-46 ms vs 30), while 1..4 give a modest win (21-27 ms —
        Huffman parsing dominates and no DCT scale removes it). The
        scanline window is the bigger lever and applies at any num."""
        for num in (1, 2, 3, 4):
            sh, sw = self.scaled_dims(num)
            if sh >= oh and sw >= ow:
                return num
        return 8

    def decode_window(self, num: int, row_lo: int, row_hi: int):
        """Rows [row_lo, row_hi) of the num/8-scaled image, u8 RGB,
        or None on decode failure (caller falls back to PIL)."""
        lib = native_lib()
        if lib is None:
            return None
        sh, sw = self.scaled_dims(num)
        row_lo = max(0, min(int(row_lo), sh))
        row_hi = max(row_lo, min(int(row_hi), sh))
        buf = np.frombuffer(self.data, np.uint8)
        out = np.empty((row_hi - row_lo, sw, 3), np.uint8)
        # (sh, sw) are passed down so the C side can verify libjpeg
        # agreed on the scaled dims the buffer was allocated for — a
        # libjpeg that rounds scale_num (classic 6b: 1/2/4/8 only)
        # returns -1 here instead of overflowing `out`
        if lib.decode_jpeg_rgb_scaled(
            buf, buf.size, num, sh, sw, row_lo, row_hi, out.reshape(-1)
        ) != 0:
            return None
        return out

    def to_pil(self):
        """Full eager decode (native, then PIL fallback)."""
        from PIL import Image

        arr = decode_jpeg(self.data)
        if arr is not None:
            return Image.fromarray(arr)
        import io

        return Image.open(io.BytesIO(self.data)).convert("RGB")

    # PIL duck-typing used by the non-native _sync_transform fallback
    def convert(self, mode):
        return self.to_pil().convert(mode)


def resample_row_window(sh: int, oh: int, y_lo: int, y_hi: int):
    """Source-row window [lo, hi) that a PIL-convention triangle
    resample sh -> oh reads for output rows [y_lo, y_hi). Mirrors
    build_windows() in native/segtron_host.cpp (support = max(scale,1),
    taps in [floor(center-support), ceil(center+support)) clamped)."""
    import math

    if y_hi <= y_lo:
        return 0, 0
    scale = sh / oh
    support = max(scale, 1.0)
    lo = math.floor((y_lo + 0.5) * scale - support)
    hi = math.ceil((y_hi - 0.5) * scale + support)
    return max(0, lo), min(sh, hi)


def open_rgb(path: str, lazy: bool = False):
    """Open an image as a PIL RGB image, decoding JPEGs natively
    (libjpeg, outside the GIL) when possible. Returns a PIL Image
    either way so the transform pipeline is unchanged.

    With ``lazy=True`` (the train path), JPEGs come back as a
    ``LazyJpeg`` instead — header dims only, pixels decoded later at
    the DCT scale / scanline window the augmentation actually needs.
    Gate: env SEGMENTRON_SCALED_DECODE=0 restores eager decode.

    With the decoded cache enabled (``cfg.DATASET.DECODED_CACHE`` /
    env SEGMENTRON_DECODED_CACHE), a hit returns a memory-mapped
    ``CachedImage`` without touching the source file's pixels; a miss
    decodes at FULL resolution (the cache must hold exact pixels, so
    the DCT-scaled lazy path is bypassed once per file) and populates
    the cache for every later epoch."""
    from PIL import Image

    from .cache import CachedImage, decoded_cache

    cache = decoded_cache()
    if cache is not None:
        arr = cache.get(path)
        # full hit validation (3-channel RGB) rather than an assert in
        # CachedImage (stripped under -O): anything else — e.g. a
        # corrupt/foreign RGBA entry — is treated as a miss and the
        # source is decoded fresh.
        if (
            arr is not None
            and arr.ndim == 3
            and arr.shape[2] == 3
            and arr.dtype == np.uint8
        ):
            return CachedImage(arr)

    # resolve the cache key BEFORE reading any source bytes so a file
    # replaced mid-read cannot publish old pixels under the new key
    cache_entry = cache.entry_for(path) if cache is not None else None

    if path.lower().endswith((".jpg", ".jpeg")):
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError:
            data = None
        if data is not None:
            if (
                cache is None
                and lazy
                and native_lib() is not None
                and os.environ.get("SEGMENTRON_SCALED_DECODE", "1") != "0"
            ):
                buf = np.frombuffer(data, np.uint8)
                h = ctypes.c_int()
                w = ctypes.c_int()
                lib = native_lib()
                if (
                    lib.jpeg_dims(buf, buf.size, ctypes.byref(h), ctypes.byref(w))
                    == 0
                ):
                    return LazyJpeg(data, h.value, w.value)
            arr = decode_jpeg(data)
            if arr is not None:
                if cache is not None:
                    cache.put(path, arr, entry=cache_entry)
                    return CachedImage(arr)
                return Image.fromarray(arr)
    img = Image.open(path).convert("RGB")
    if cache is not None:
        arr = np.asarray(img, np.uint8)
        cache.put(path, arr, entry=cache_entry)
        return CachedImage(arr)
    return img


def train_augment(
    src: np.ndarray,
    flip: bool,
    out_hw,
    crop_yx,
    crop: int,
    blur_sigma: float,
    mean: np.ndarray,
    std: np.ndarray,
    src_y0: int = 0,
    sh_full: Optional[int] = None,
) -> Optional[np.ndarray]:
    """Fused train augmentation (native/segtron_host.cpp::
    train_augment_u8): hflip + random-scale resize to ``out_hw`` + pad
    + crop ``crop`` at ``crop_yx`` + gaussian blur + normalize, one
    OpenMP pass. Returns f32 (crop, crop, 3), or None without the
    native lib.

    ``src`` may be a row window of a taller image (the DCT-scaled JPEG
    path): it holds rows [src_y0, src_y0+src.shape[0]) of an
    ``sh_full``-row source, and the vertical resample indexes it
    relative to ``src_y0``."""
    lib = native_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    oh, ow = out_hw
    y1, x1 = crop_yx
    out = np.empty((crop, crop, 3), np.float32)
    lib.train_augment_u8(
        src, src.shape[0], src.shape[1], int(src_y0),
        int(sh_full if sh_full is not None else src.shape[0]),
        int(flip), int(oh), int(ow),
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
