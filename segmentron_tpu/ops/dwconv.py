"""Depthwise 3x3 conv via shifted slices — fast path for LARGE dilations.

XLA's TPU lowering of a dilated depthwise conv degrades with the
dilation rate (measured @64x128x2048 bf16, stride 1: d=6 0.485 ms,
d=12 0.805, d=18 1.181), while the same op expressed as 9 statically
shifted slices of the padded input — one fused elementwise VPU kernel —
stays flat (~0.67 ms at every rate). Crossover is between d=6 and d=12,
so `dilation >= 12` routes here: that covers the ASPP atrous branches
(rates 12/18 at OS16, 12/24/36 at OS8) and DenseASPP's upper rates,
which are exactly where the reference spends its dilated convs
(reference: ``segmentron/modules/module.py::_ASPP``).

At small dilations and at big-spatial/small-channel geometries the
XLA conv lowering wins (measured: d=1 @512x1024x128 conv 1.48 vs
shift 1.89 ms) — callers must gate, e.g. via `prefer_shift`.

Exact: same taps, f32 accumulation like the conv path's
``preferred_element_type``.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

__all__ = ["depthwise_shift3x3", "prefer_shift"]

_SHIFT_MIN_DILATION = 12


def prefer_shift(
    kernel_size: Tuple[int, int],
    stride: Tuple[int, int],
    dilation: Tuple[int, int],
) -> bool:
    """True when the shifted-slice formulation measured faster than the
    XLA dilated-depthwise lowering (3x3, stride 1, dilation >= 12)."""
    return (
        kernel_size == (3, 3)
        and stride == (1, 1)
        and dilation[0] == dilation[1]
        and dilation[0] >= _SHIFT_MIN_DILATION
    )


def depthwise_shift3x3(
    x: jax.Array,
    kernel: jax.Array,
    dilation: Union[int, Tuple[int, int]] = 1,
    out_dtype=None,
) -> jax.Array:
    """Depthwise 3x3, stride 1, 'same' padding, as 9 shifted MACs.

    ``kernel`` is the canonical HWIO depthwise weight ``(3, 3, 1, C)``.
    Output dtype follows ``x`` unless ``out_dtype`` is given
    (accumulation is always f32, matching the conv path's
    ``preferred_element_type=float32``; consumers that feed a quantizer
    pass ``out_dtype=float32`` to keep the accumulator unrounded).
    """
    d = dilation if isinstance(dilation, int) else dilation[0]
    n, h, w, c = x.shape
    kf = kernel.astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = xp[:, dy * d:dy * d + h, dx * d:dx * d + w, :].astype(
                jnp.float32
            ) * kf[dy, dx, 0]
            acc = t if acc is None else acc + t
    return acc.astype(out_dtype if out_dtype is not None else x.dtype)
