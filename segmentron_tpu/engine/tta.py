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

import functools
import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import resize_bilinear
from ..ops.preprocess import maybe_normalize
from ..utils.compileopts import tpu_compiler_options

__all__ = ["predict_whole", "predict_sliding", "multi_scale_predict"]


def predict_whole(predict_fn: Callable, variables, image: jax.Array) -> jax.Array:
    """image (1, H, W, 3) -> logits (1, H, W, C)."""
    return predict_fn(variables, image)


def _grid_positions(ph: int, pw: int, crop: int, stride: int):
    rows = max(int(math.ceil((ph - crop) / stride)) + 1, 1)
    cols = max(int(math.ceil((pw - crop) / stride)) + 1, 1)
    return [
        (min(r * stride, ph - crop), min(c * stride, pw - crop))
        for r in range(rows)
        for c in range(cols)
    ]


def _sliding_body(predict_fn, variables, image, crop: int, stride: int,
                  nclass: int):
    """Trace-time sliding-window body: extract EVERY window, run the
    model over them as one batch, stitch with static scatter-adds.
    Pure (no jit inside) so it can run under an outer jit OR inside a
    shard_map eval step."""
    _, h, w, ch = image.shape
    pad_h = max(crop - h, 0)
    pad_w = max(crop - w, 0)
    ph, pw = h + pad_h, w + pad_w
    grid = _grid_positions(ph, pw, crop, stride)
    padded = jnp.pad(image, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    windows = jnp.concatenate(
        [
            jax.lax.dynamic_slice(padded, (0, y0, x0, 0), (1, crop, crop, ch))
            for (y0, x0) in grid
        ],
        axis=0,
    )  # (n_windows, crop, crop, ch)
    logits = predict_fn(variables, windows).astype(jnp.float32)
    canvas = jnp.zeros((ph, pw, nclass), jnp.float32)
    count = jnp.zeros((ph, pw, 1), jnp.float32)
    for i, (y0, x0) in enumerate(grid):
        canvas = canvas.at[y0 : y0 + crop, x0 : x0 + crop].add(logits[i])
        count = count.at[y0 : y0 + crop, x0 : x0 + crop].add(1.0)
    return (canvas / jnp.maximum(count, 1.0))[None, :h, :w]


@functools.lru_cache(maxsize=64)
def _sliding_fn(predict_id, h: int, w: int, ch: int, crop: int, stride: int,
                nclass: int):
    """One jitted program per shape bucket — a single device dispatch
    per image instead of one per window (the relay's ~80 ms dispatch
    latency makes eager window loops ~100x slower; on any TPU the
    batched form also fills the chip far better than crop-sized calls)."""
    # unwrap jitted-with-compiler_options predictors: the options are
    # only legal on THIS outermost jit, not on a nested one
    predict_fn = _PREDICT_REGISTRY[predict_id]
    predict_fn = getattr(predict_fn, "raw", predict_fn)

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def run(variables, image):  # image (1, h, w, ch)
        # raw-uint8 loader mode: normalize first (host order), so the
        # zero pad below stays a normalized-space zero
        image = maybe_normalize(image)
        return _sliding_body(predict_fn, variables, image, crop, stride, nclass)

    return run


# token -> predict_fn, so the lru_cache key stays hashable. Tokens are
# monotonic (never reused — unlike id(), which the allocator recycles
# after GC and could silently serve a stale jitted program for a
# different model); the strong ref here pins the predictor for the
# lifetime of its cached executables.
_PREDICT_REGISTRY: dict = {}
_TOKEN_ATTR = "_segtron_tta_token"
_token_counter = iter(range(1 << 62)).__next__


def _predict_token(predict_fn: Callable) -> int:
    tok = getattr(predict_fn, _TOKEN_ATTR, None)
    if tok is None or _PREDICT_REGISTRY.get(tok) is not predict_fn:
        tok = _token_counter()
        try:
            setattr(predict_fn, _TOKEN_ATTR, tok)
        except AttributeError:
            pass  # unsettable callable: a fresh token per call (no reuse)
        _PREDICT_REGISTRY[tok] = predict_fn
    return tok


def predict_sliding(
    predict_fn: Callable,
    variables,
    image: jax.Array,
    crop_size: int,
    nclass: int,
    stride_ratio: float = 2.0 / 3.0,
) -> jax.Array:
    """Batched sliding-window logits with count-normalised stitching.

    Compiles one program per (image-shape, crop) bucket; all windows of
    an image run as a single batched forward."""
    n, h, w, ch = image.shape
    stride = int(math.ceil(crop_size * stride_ratio))
    run = _sliding_fn(
        _predict_token(predict_fn), h, w, ch, crop_size, stride, nclass
    )
    if n == 1:
        return run(variables, image)
    return jnp.concatenate(
        [run(variables, image[i : i + 1]) for i in range(n)], axis=0
    )


def _multi_scale_body(
    predict_fn, variables, image, nclass, scales, flip, crop_size,
    align_corners,
):
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
                stride = int(math.ceil(crop_size * 2.0 / 3.0))
                parts = [
                    _sliding_body(predict_fn, variables, img[i : i + 1],
                                  crop_size, stride, nclass)
                    for i in range(img.shape[0])
                ]
                logits = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
            else:
                logits = predict_fn(variables, img)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            if vi == 1:
                probs = probs[:, :, ::-1]
            if probs.shape[1:3] != (h, w):
                probs = resize_bilinear(probs, (h, w), align_corners=align_corners)
            total = total + probs
    return total


@functools.lru_cache(maxsize=64)
def _ms_fn(predict_id, nclass, scales, flip, crop_size, align_corners):
    predict_fn = _PREDICT_REGISTRY[predict_id]
    predict_fn = getattr(predict_fn, "raw", predict_fn)  # see _sliding_fn

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def run(variables, image):
        # normalize raw uint8 BEFORE the scale resizes (host order)
        image = maybe_normalize(image)
        return _multi_scale_body(
            predict_fn, variables, image, nclass, list(scales), flip,
            crop_size, align_corners,
        )

    return run


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
    resolution: (1, H, W, C).

    The full accumulation (resizes, forwards, sliding windows, softmax
    sums) compiles into ONE program per (image shape, scales, flip,
    crop) bucket — a single device dispatch per image."""
    run = _ms_fn(
        _predict_token(predict_fn), nclass, tuple(scales), bool(flip),
        int(crop_size) if crop_size else None, bool(align_corners),
    )
    return run(variables, image)
