"""Host side of the device input pipeline (VERDICT r4 next-round #1).

The measured r4 input-path gaps (BASELINE.md "Host input pipeline"):
train feed 12.7 img/s warm vs 63.9 img/s step demand, testval feed
normalize-bound at ~2.3 img/s — both dominated by host passes the TPU
can do for free. This module moves them on device:

- **normalize-only mode** (testval/serving): the dataset ships the raw
  uint8 image; ``ops/preprocess.py::maybe_normalize`` folds the
  ``(x/255 - mean)/std`` into the jitted graph, bit-identical to the
  host LUT. The 24 MB/img host normalize pass (the measured testval
  bottleneck) and the 4x float32 relay traffic disappear.
- **train-augment mode**: the host keeps ONLY the decode (a memory-map
  read on warm decoded-cache epochs) plus the per-sample RNG draws and
  two PIL-exact nearest index vectors; random scale/crop/flip/blur/
  normalize run inside the train step as per-sample resample matmuls
  (``ops/preprocess.py::augment_images``).

The augmentation STREAM is identical to the host path: the same
per-(seed, epoch, index) RNG makes the same draws in the same order
(``draw_train_params`` is shared with ``_sync_transform_native``), so
flipping ``cfg.TPU.DEVICE_AUGMENT`` changes where pixels are computed,
never which geometry is sampled. Masks stay bit-exact with the PIL
path: PIL's NEAREST tie behavior has no closed form (r3 finding), so
the source indices are extracted from PIL itself by resizing an index
ramp (``pil_nearest_indices``) and applied on device as row/column
takes.

Static shapes: sources ship zero-padded to a per-dataset canvas
(``DEVICE_CANVAS`` class attribute or ``cfg.DATASET.DEVICE_CANVAS``);
true dims travel as data. Datasets without a known canvas fall back to
the host augment automatically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = [
    "DeviceInput",
    "draw_train_params",
    "pil_nearest_indices",
    "resolve_canvas",
]


def draw_train_params(rng, w: int, h: int, base_size: int, crop_size: int):
    """The reference's train-augment draws, in the exact order of
    ``seg_data_base.py::_sync_transform`` (flip, short side, crop
    corner, blur) so host and device augmentation consume identical
    per-(seed, epoch, index) streams. Returns
    (flip, oh, ow, x1, y1, blur_sigma)."""
    flip = rng.random() < 0.5
    short_size = rng.randint(int(base_size * 0.5), int(base_size * 2.0))
    if h > w:
        ow = short_size
        oh = int(1.0 * h * ow / w)
    else:
        oh = short_size
        ow = int(1.0 * w * oh / h)
    # padded dims (pad only below crop; above crop max() is the identity)
    w2, h2 = max(ow, crop_size), max(oh, crop_size)
    x1 = rng.randint(0, w2 - crop_size)
    y1 = rng.randint(0, h2 - crop_size)
    blur_sigma = 0.0
    if rng.random() < 0.5:
        blur_sigma = rng.random()  # PIL radius == gaussian sigma
    return flip, oh, ow, x1, y1, blur_sigma


def pil_nearest_indices(src: int, dst: int) -> np.ndarray:
    """PIL's exact NEAREST source index for each output position of a
    1-D ``src -> dst`` resize, extracted from PIL itself by resizing an
    int32 index ramp (nearest resize is separable and mode-independent
    geometry, so the 1-D ramps reproduce the 2-D mask resize exactly —
    pinned by tests/test_device_input.py)."""
    from PIL import Image

    ramp = np.arange(src, dtype=np.int32).reshape(1, src)
    out = Image.fromarray(ramp, mode="I").resize((dst, 1), Image.NEAREST)
    return np.asarray(out, np.int32).reshape(dst)


def resolve_canvas(dataset) -> Optional[Tuple[int, int]]:
    """Static (H, W) source canvas for ``dataset``: the config override
    wins, else the dataset class's ``DEVICE_CANVAS``, else None (host
    augment fallback)."""
    from ..config import cfg

    override = tuple(cfg.DATASET.DEVICE_CANVAS)
    if len(override) == 2:
        return int(override[0]), int(override[1])
    canvas = getattr(dataset, "DEVICE_CANVAS", None)
    if canvas:
        return int(canvas[0]), int(canvas[1])
    return None


def _to_u8(img) -> np.ndarray:
    """Decoded full-res uint8 HWC pixels from any of the image wrappers
    the loaders produce (PIL, CachedImage, LazyJpeg)."""
    if hasattr(img, "to_pil") and not hasattr(img, "convert"):
        img = img.to_pil()  # LazyJpeg: full decode
    arr = np.asarray(img.convert("RGB"), np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    return arr


class DeviceInput:
    """Per-dataset host-side builder for device-input items.

    ``normalize_only=True`` (testval/serving): ``_testval_transform``
    ships the raw uint8 image. Otherwise (train): ``build_train_item``
    ships the padded uint8 canvas + class-mapped int16 mask + the RNG's
    geometry scalars + PIL-exact mask index vectors.
    """

    def __init__(self, dataset=None, canvas=None, normalize_only=False):
        self.normalize_only = bool(normalize_only)
        self.canvas = tuple(canvas) if canvas else None
        self.pad_label = 0
        if dataset is not None and not self.normalize_only:
            from PIL import Image

            fill = np.full((1, 1), dataset.MASK_PAD_FILL, np.int32)
            # the host path pads the RAW mask then class-maps; mapping
            # the constant through the dataset's own _mask_transform
            # gives the identical post-map pad value
            self.pad_label = int(
                np.asarray(
                    dataset._mask_transform(Image.fromarray(fill, mode="I"))
                ).reshape(-1)[0]
            )

    # ------------------------------------------------------------- train
    def build_train_item(self, dataset, img, mask, rng) -> dict:
        """One device-augment sample: all host work is the decode, the
        six RNG scalars, one full-res mask class-map, and two PIL ramp
        resizes."""
        sh, sw = self.canvas
        arr = _to_u8(img)
        h, w = arr.shape[:2]
        if h > sh or w > sw:
            raise ValueError(
                f"source {h}x{w} exceeds the device-augment canvas "
                f"{sh}x{sw} — set DATASET.DEVICE_CANVAS to cover the "
                "largest source image (or disable TPU.DEVICE_AUGMENT)"
            )
        flip, oh, ow, x1, y1, sigma = draw_train_params(
            rng, w, h, dataset.base_size, dataset.crop_size
        )
        crop = dataset.crop_size

        image = np.zeros((sh, sw, 3), np.uint8)
        image[:h, :w] = arr

        m = np.asarray(dataset._mask_transform(mask), np.int32)
        mask_c = np.full((sh, sw), self.pad_label, np.int16)
        mask_c[:h, :w] = m.astype(np.int16)

        rowmap = pil_nearest_indices(h, oh)
        colmap = pil_nearest_indices(w, ow)
        row_sel = np.full((crop,), -1, np.int32)
        nr = max(min(crop, oh - y1), 0)
        row_sel[:nr] = rowmap[y1 : y1 + nr]
        col_sel = np.full((crop,), -1, np.int32)
        nc = max(min(crop, ow - x1), 0)
        cols = colmap[x1 : x1 + nc]
        col_sel[:nc] = (w - 1 - cols) if flip else cols

        return {
            "image": image,
            "mask": mask_c,
            "aug_geom": np.asarray(
                [h, w, oh, ow, x1, y1, int(flip)], np.int32
            ),
            "aug_sigma": np.float32(sigma),
            "row_sel": row_sel,
            "col_sel": col_sel,
        }

    # ----------------------------------------------------------- testval
    def testval_image(self, img) -> np.ndarray:
        """Raw uint8 pixels for the in-graph normalize path."""
        return _to_u8(img)
