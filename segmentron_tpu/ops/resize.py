"""Exact bilinear resize with torch ``align_corners`` semantics.

The reference leans on ATen ``F.interpolate(..., mode='bilinear',
align_corners=True)`` everywhere (decoder upsampling, multi-scale TTA,
logit stitching); every model's mIoU parity gates on reproducing it
bit-exactly (SURVEY.md §7 "hard parts").

TPU-native design: 1-D interpolation along H and W is a *linear map*,
so we materialise the two interpolation matrices at trace time (they
depend only on static shapes) and lower the whole resize to two
matmuls — ``out = W_h @ x @ W_w^T`` — which XLA tiles onto the MXU and
fuses with surrounding ops. This beats gather-based formulations on TPU
(gathers are VPU/memory-bound; matmuls are MXU-bound) and is exact:
each row of the matrix holds the two bilinear weights of a source pixel
pair.

Reference semantics reproduced:
- ``align_corners=True``:  src = dst * (in-1)/(out-1)
- ``align_corners=False``: src = (dst + 0.5) * in/out - 0.5, clamped.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_bilinear", "interp_matrix", "resize_nearest"]


@functools.lru_cache(maxsize=None)
def _interp_weights(in_size: int, out_size: int, align_corners: bool):
    """Host-side (numpy) construction of the (out_size, in_size) matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float64)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if in_size == 1 or out_size == 1:
            # torch places the single sample at source coord 0
            src = np.zeros_like(dst)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        src = (dst + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    w = np.zeros((out_size, in_size), np.float64)
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w


def interp_matrix(
    in_size: int, out_size: int, align_corners: bool, dtype=jnp.float32
) -> jax.Array:
    """Bilinear 1-D interpolation matrix of shape (out_size, in_size)."""
    return jnp.asarray(_interp_weights(in_size, out_size, align_corners), dtype)


def resize_bilinear(
    x: jax.Array,
    size: Sequence[int],
    align_corners: bool = True,
) -> jax.Array:
    """Bilinear-resize NHWC (or HWC) ``x`` to spatial ``size=(H, W)``.

    Exactly matches ``torch.nn.functional.interpolate(mode='bilinear')``
    for both align_corners settings. Interpolation runs in float32 and
    is cast back to the input dtype (matching torch's fp32 math).
    """
    out_h, out_w = int(size[0]), int(size[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x[0] if squeeze else x
    orig_dtype = x.dtype
    # fp32 inputs (parity tests, TTA probability accumulation) keep
    # exact fp32 interpolation; bf16 model activations interpolate in
    # bf16 with fp32 accumulation — halving the HBM traffic of the
    # decoder upsamples, which is what bounds this workload.
    if orig_dtype == jnp.bfloat16:
        xf, prec = x, "default"
    else:
        xf, prec = x.astype(jnp.float32), "highest"
    wh = interp_matrix(in_h, out_h, align_corners, dtype=xf.dtype)
    ww = interp_matrix(in_w, out_w, align_corners, dtype=xf.dtype)
    # (N,H,W,C): contract H then W — two MXU matmuls.
    y = jnp.einsum("oh,nhwc->nowc", wh, xf, precision=prec,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,nowc->nopc", ww, y, precision=prec,
                   preferred_element_type=jnp.float32)
    y = y.astype(orig_dtype)
    return y[0] if squeeze else y


def resize_nearest(x: jax.Array, size: Sequence[int]) -> jax.Array:
    """Nearest-neighbour resize (torch 'nearest' semantics: floor(dst*scale))."""
    out_h, out_w = int(size[0]), int(size[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, in_h, in_w, c = x.shape
    rows = jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32)
    y = x[:, rows][:, :, cols]
    return y[0] if squeeze else y
