"""Multi-scale + flip TTA and sliding-window inference.

The reference implements these as torch loops over dynamic shapes
(``SegBaseModel``/``tools/eval.py`` — SURVEY.md §3.2/§5.7). The TPU
re-design keeps every compiled shape static:

- each (scale x image-shape) pair produces one fixed resized shape, so
  the jit cache holds one executable per scale bucket;
- sliding windows use a fixed window (TEST.CROP_SIZE) and a fixed
  stride, padding the image up so the window grid is static; window
  logits are summed into a canvas with a count map (logit stitching);
- probabilities (softmax) are accumulated across scales/flips, exactly
  align-corners-resized back to the source resolution.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import resize_bilinear

__all__ = ["predict_whole", "predict_sliding", "multi_scale_predict"]


def predict_whole(predict_fn: Callable, variables, image: jax.Array) -> jax.Array:
    """image (1, H, W, 3) -> logits (1, H, W, C)."""
    return predict_fn(variables, image)


def predict_sliding(
    predict_fn: Callable,
    variables,
    image: jax.Array,
    crop_size: int,
    nclass: int,
    stride_ratio: float = 2.0 / 3.0,
) -> jax.Array:
    """Static-grid sliding-window logits with count-normalised stitching."""
    n, h, w, _ = image.shape
    stride = int(math.ceil(crop_size * stride_ratio))
    pad_h = max(crop_size - h, 0)
    pad_w = max(crop_size - w, 0)
    padded = jnp.pad(image, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = padded.shape[1:3]
    rows = max(int(math.ceil((ph - crop_size) / stride)) + 1, 1)
    cols = max(int(math.ceil((pw - crop_size) / stride)) + 1, 1)
    canvas = jnp.zeros((n, ph, pw, nclass), jnp.float32)
    count = jnp.zeros((1, ph, pw, 1), jnp.float32)
    for r in range(rows):
        for c in range(cols):
            y0 = min(r * stride, ph - crop_size)
            x0 = min(c * stride, pw - crop_size)
            window = jax.lax.dynamic_slice(
                padded, (0, y0, x0, 0), (n, crop_size, crop_size, image.shape[-1])
            )
            logits = predict_fn(variables, window).astype(jnp.float32)
            canvas = jax.lax.dynamic_update_slice(
                canvas,
                jax.lax.dynamic_slice(
                    canvas, (0, y0, x0, 0), (n, crop_size, crop_size, nclass)
                )
                + logits,
                (0, y0, x0, 0),
            )
            count = jax.lax.dynamic_update_slice(
                count,
                jax.lax.dynamic_slice(count, (0, y0, x0, 0), (1, crop_size, crop_size, 1))
                + 1.0,
                (0, y0, x0, 0),
            )
    stitched = canvas / jnp.maximum(count, 1.0)
    return stitched[:, :h, :w]


def multi_scale_predict(
    predict_fn: Callable,
    variables,
    image: jax.Array,
    nclass: int,
    scales: Sequence[float] = (1.0,),
    flip: bool = False,
    crop_size: Optional[int] = None,
    align_corners: bool = True,
) -> jax.Array:
    """Accumulated softmax probabilities over scales (+ flip) at source
    resolution: (1, H, W, C)."""
    n, h, w, _ = image.shape
    total = jnp.zeros((n, h, w, nclass), jnp.float32)
    for s in scales:
        sh, sw = int(h * s + 0.5), int(w * s + 0.5)
        scaled = (
            image
            if (sh, sw) == (h, w)
            else resize_bilinear(image, (sh, sw), align_corners=align_corners)
        )
        variants = [scaled]
        if flip:
            variants.append(scaled[:, :, ::-1])
        for vi, img in enumerate(variants):
            if crop_size is not None and max(sh, sw) > crop_size:
                logits = predict_sliding(predict_fn, variables, img, crop_size, nclass)
            else:
                logits = predict_fn(variables, img)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            if vi == 1:
                probs = probs[:, :, ::-1]
            if probs.shape[1:3] != (h, w):
                probs = resize_bilinear(probs, (h, w), align_corners=align_corners)
            total = total + probs
    return total
