"""On-device input preprocessing: in-graph normalize + train augmentation.

TPU re-design of the reference's host-side input pipeline tail
(``segmentron/data/dataloader/seg_data_base.py::_sync_transform`` — the
random scale/crop/flip/blur/normalize chain). The host keeps only the
DECODE; everything after it runs inside the jitted step (VERDICT r4
next-round #1):

- the loader ships raw **uint8** pixels (4x less relay traffic than the
  float32 tensors it used to stack, and none of the measured 24 MB/img
  host normalize pass — the r4 testval bottleneck);
- normalize is one fused elementwise op in-graph (`maybe_normalize`),
  identical to the host LUT to <= 1-2 ulp (same f32 ``(x/255 - mean)/std``
  chain; XLA strength-reduces the constant divisions to reciprocal
  multiplies — pinned by tests/test_device_input.py);
- the train random-scale-crop-flip becomes per-sample **dense resample
  matmuls** (the `ops/resize.py` lesson: matrices beat gathers on the
  MXU even at high FLOP waste), built on device from the host RNG's
  scalar draws, so the augmentation *stream* is byte-identical to the
  host path's per-(seed, epoch, index) draws;
- the gaussian blur is 7 statically shifted slices with per-sample
  kernel weights (the `ops/dwconv.py` shift pattern);
- masks resample through PIL-exact nearest index vectors computed on
  the host (see ``data/device_input.py``) applied as whole-row/column
  takes — bit-identical to the PIL mask path.

Semantics parity with the fused native host augment
(``native/segtron_host.cpp::train_augment_u8``) is pinned by
``tests/test_device_input.py``: identical triangle-filter windows
(PIL BILINEAR convention incl. the widened support on downscale),
identical zero-pad -> normalized pad value, identical blur kernel
(radius ``max(1, int(3*sigma + 0.5))``), f32 arithmetic throughout
(differences are summation-order only).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "maybe_normalize",
    "normalize_u8",
    "resample_matrix",
    "augment_images",
    "augment_masks",
]


def normalize_u8(images: jax.Array, mean, std) -> jax.Array:
    """uint8 RGB -> f32 ``(x/255 - mean)/std``, the exact op order of the
    host paths (`numpy` fallback and the native LUT); XLA's constant-
    division strength reduction leaves <= 1-2 ulp per element."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (images.astype(jnp.float32) / 255.0 - mean) / std


def maybe_normalize(images: jax.Array) -> jax.Array:
    """Normalize in-graph iff the input is raw uint8 (the device-input
    loader mode); float inputs (host-normalized) pass through untouched,
    so every existing f32 path traces exactly as before.

    ``cfg.DATASET.MEAN/STD`` are read at trace time, matching how every
    other module resolves config."""
    if images.dtype != jnp.uint8:
        return images
    from ..config import cfg

    return normalize_u8(images, list(cfg.DATASET.MEAN), list(cfg.DATASET.STD))


def resample_matrix(
    src_static: int,
    out_len: int,
    src_true: jax.Array,
    dst_true: jax.Array,
    offset: jax.Array,
    flip: Optional[jax.Array] = None,
) -> jax.Array:
    """(src_static, out_len) f32 triangle-filter resample matrix.

    Column ``j`` holds the PIL-BILINEAR weights producing output pixel
    ``offset + j`` of a ``src_true -> dst_true`` resize (support widened
    by the scale on downscale, weights normalized to sum 1 — the exact
    convention of ``segtron_host.cpp::build_windows``). Matrix rows
    beyond ``src_true`` (the padded canvas) and columns whose scaled
    index falls outside ``dst_true`` (the reference's zero pad when the
    scaled image is smaller than the crop) are zero. With ``flip``, the
    horizontal mirror folds into the source indexing, exactly like the
    native kernel's ``sx = sw-1-s``.

    All the ``*_true``/``offset``/``flip`` scalars are traced values —
    shapes stay static, geometry is data.
    """
    src = src_true.astype(jnp.float32)
    dst = dst_true.astype(jnp.float32)
    scale = src / dst
    inv = jnp.minimum(1.0 / scale, 1.0)
    j = jnp.arange(out_len, dtype=jnp.float32)
    centers = (offset.astype(jnp.float32) + j + 0.5) * scale  # (out_len,)
    s = jnp.arange(src_static, dtype=jnp.float32)
    if flip is not None:
        u = jnp.where(flip > 0, src - 1.0 - s, s)
    else:
        u = s
    x = jnp.abs((u[:, None] + 0.5 - centers[None, :]) * inv)
    w = jnp.maximum(0.0, 1.0 - x)
    # taps outside the true source contribute nothing (the window clamp
    # of the C++ builder); ditto output columns past the scaled extent
    in_src = (u >= 0.0) & (u <= src - 1.0)
    w = w * in_src[:, None]
    col_ok = (offset + jnp.arange(out_len, dtype=offset.dtype)) < dst_true
    w = w * col_ok[None, :].astype(jnp.float32)
    total = jnp.sum(w, axis=0)
    # degenerate column (all taps zero): nearest source pixel, like the
    # C++ fallback. Never hit at sane geometries; keeps the matrix a
    # partition of unity everywhere.
    nearest = jnp.clip(jnp.floor(centers), 0.0, src - 1.0)
    onehot = (u[:, None] == nearest[None, :]).astype(jnp.float32)
    onehot = onehot * col_ok[None, :].astype(jnp.float32)
    safe = jnp.where(total > 0.0, total, 1.0)
    return jnp.where(total[None, :] > 0.0, w / safe[None, :], onehot)


def _blur7(x: jax.Array, sigma: jax.Array, crop: int) -> jax.Array:
    """Separable gaussian blur with a per-sample kernel, exactly the
    native pass: radius ``max(1, int(sigma*3 + 0.5))`` (<= 3 at the
    reference's sigma < 1 draw), taps beyond the radius exactly zero,
    clamp-to-edge borders, horizontal then vertical. ``sigma == 0``
    reduces to a delta kernel — bit-exact identity — so the 50% no-blur
    draws cost nothing semantically and the shape stays static."""
    r = jnp.maximum(1.0, jnp.floor(sigma * 3.0 + 0.5))
    t = jnp.arange(-3, 4, dtype=jnp.float32)
    k = jnp.exp(-0.5 * t * t / jnp.maximum(sigma * sigma, 1e-20))
    k = jnp.where(jnp.abs(t) <= r, k, 0.0)
    k = k / jnp.sum(k)
    k = jnp.where(sigma > 0.0, k, (t == 0.0).astype(jnp.float32))
    xp = jnp.pad(x, ((0, 0), (3, 3), (0, 0)), mode="edge")
    x = sum(k[i] * xp[:, i : i + crop, :] for i in range(7))
    xp = jnp.pad(x, ((3, 3), (0, 0), (0, 0)), mode="edge")
    x = sum(k[i] * xp[i : i + crop, :, :] for i in range(7))
    return x


def augment_images(
    images: jax.Array,
    geom: jax.Array,
    sigma: jax.Array,
    crop: int,
    mean,
    std,
) -> jax.Array:
    """Batched train augmentation on raw uint8 canvases.

    images (B, SH, SW, 3) uint8 — sources zero-padded to the static
    canvas; geom (B, 7) int32 ``[h, w, oh, ow, x1, y1, flip]`` (true
    source dims, scaled dims, crop corner, hflip) drawn by the HOST
    per-sample RNG (identical stream to the host augment); sigma (B,)
    f32 blur sigmas (0 = none). Returns (B, crop, crop, 3) f32
    normalized — what the host fused augment ships, computed on device.

    The resample runs as two dense matmuls per sample (W then H, the
    native kernel's pass order) at ``precision='highest'`` — f32
    fidelity to the C++ accumulation; ~13 GFLOP per 1024x2048 source,
    well under 1 ms/image on the MXU.
    """
    _, SH, SW, _ = images.shape
    mean = jnp.asarray(mean, jnp.float32)
    inv_std = 1.0 / jnp.asarray(std, jnp.float32)
    inv255 = jnp.float32(1.0 / 255.0)

    def one(img, g, sg):
        h, w, oh, ow, x1, y1, flip = (g[i] for i in range(7))
        rw = resample_matrix(SW, crop, w, ow, x1, flip)  # (SW, crop)
        rh = resample_matrix(SH, crop, h, oh, y1, None)  # (SH, crop)
        t = jnp.einsum(
            "hwc,wj->hjc", img.astype(jnp.float32), rw, precision="highest"
        )
        t = jnp.einsum("hi,hjc->ijc", rh, t, precision="highest")
        # native epilogue order: (acc * inv255 - mean) * inv_std; the
        # all-zero pad rows/cols come out at the normalized pad value
        # (0 - mean)/std automatically
        out = (t * inv255 - mean) * inv_std
        return _blur7(out, sg, crop)

    return jax.vmap(one)(images, geom, sigma)


def augment_masks(
    masks: jax.Array,
    row_sel: jax.Array,
    col_sel: jax.Array,
    pad_label: int,
) -> jax.Array:
    """Mask crop via host-computed PIL-exact nearest index vectors.

    masks (B, SH, SW) int16/int32 — CLASS-MAPPED full-res labels (remap
    commutes with nearest resample and with padding, so mapping on the
    host first keeps per-dataset ``_mask_transform`` semantics intact);
    row_sel/col_sel (B, crop) int32 source indices with ``-1`` marking
    pad positions. Whole-row/column takes only — never a per-pixel
    gather (CLAUDE.md TPU rule)."""

    def one(m, rs, cs):
        rows = jnp.take(m.astype(jnp.int32), jnp.maximum(rs, 0), axis=0)
        out = jnp.take(rows, jnp.maximum(cs, 0), axis=1)
        out = jnp.where(rs[:, None] < 0, pad_label, out)
        out = jnp.where(cs[None, :] < 0, pad_label, out)
        return out

    return jax.vmap(one)(masks, row_sel, col_sel)


class DeviceAugment:
    """Traced-side bundle for the device train-augment step: holds the
    static crop/normalize/pad config and applies the full augmentation
    to a device batch dict (built by ``data/device_input.py``)."""

    def __init__(self, crop: int, mean, std, pad_label: int):
        self.crop = int(crop)
        self.mean = tuple(float(m) for m in mean)
        self.std = tuple(float(s) for s in std)
        self.pad_label = int(pad_label)

    def apply(self, batch: dict):
        """batch dict -> (images f32 (B, crop, crop, 3), masks i32)."""
        images = augment_images(
            batch["image"], batch["aug_geom"], batch["aug_sigma"],
            self.crop, self.mean, self.std,
        )
        masks = augment_masks(
            batch["mask"], batch["row_sel"], batch["col_sel"], self.pad_label
        )
        return images, masks
