"""Point sampling — the TPU equivalent of ATen ``grid_sample`` for
PointRend (SURVEY.md §2.9: gather-based bilinear point sampling).

Coordinates are continuous, normalized to [0, 1] with
``align_corners=False`` semantics (pixel centers at (i + 0.5)/size),
matching ``F.grid_sample`` as used by PointRend. Pure gathers +
weighted sums: XLA lowers them to vectorized dynamic-slices, no
scatter/atomics needed.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["point_sample", "uncertainty_top2"]


def point_sample(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample ``feat`` (B, H, W, C) at ``coords`` (B, N, 2).

    coords[..., 0] is x (width direction), coords[..., 1] is y, both in
    [0, 1]. Returns (B, N, C). Out-of-range coords clamp to the border
    (grid_sample ``padding_mode='border'``).
    """
    b, h, w, c = feat.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = feat.reshape(b, h * w, c)
        idx = yi * w + xi  # (B, N)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    f00 = gather(y0, x0)
    f01 = gather(y0, x0 + 1)
    f10 = gather(y0 + 1, x0)
    f11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy


def uncertainty_top2(logits: jnp.ndarray) -> jnp.ndarray:
    """PointRend uncertainty: -(top1 - top2) over the class axis.

    Accepts (..., C); higher = more uncertain.
    """
    top2 = jnp.sort(logits, axis=-1)[..., -2:]
    return top2[..., 0] - top2[..., 1]
