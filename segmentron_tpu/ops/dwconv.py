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


# --------------------------------------------------------------- hybrid VJP
# Training probe (BASELINE.md round-3 "train-step roofline"): the
# forward keeps XLA's depthwise conv lowering (measured fastest at
# small dilation — the all-shift variant regressed 125 -> 253 ms/step),
# while the BACKWARD is rewritten as shifted MACs: dx is the
# kernel-flipped shift correlation and dk nine shifted multiply-
# reduces — pure fused VPU work instead of XLA's grad convs.
import functools as _functools

from jax import lax as _lax


def _dw_conv_fwd(x, kernel, d):
    c = x.shape[-1]
    return _lax.conv_general_dilated(
        x, kernel, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise3x3_shiftbwd(x, kernel, dilation: int = 1):
    """Depthwise 3x3, stride 1, 'same' padding, dilation ``d``:
    XLA conv forward + shift-MAC backward (see above)."""
    return _dw_conv_fwd(x, kernel, dilation)


def _dw_shiftbwd_fwd(x, kernel, d):
    return _dw_conv_fwd(x, kernel, d), (x, kernel)


def _dw_shiftbwd_bwd(d, res, g):
    x, kernel = res
    n, h, w, c = x.shape
    kf = kernel.astype(jnp.float32)
    gp = jnp.pad(g, ((0, 0), (d, d), (d, d), (0, 0)))
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    dx = None
    dk = []
    for dy in range(3):
        row = []
        for dxi in range(3):
            # dx: correlation of g with the spatially flipped kernel
            t = gp[
                :, (2 - dy) * d : (2 - dy) * d + h,
                (2 - dxi) * d : (2 - dxi) * d + w, :,
            ].astype(jnp.float32) * kf[dy, dxi, 0]
            dx = t if dx is None else dx + t
            # dk[tap] = <x shifted by tap, g>
            row.append(
                jnp.sum(
                    xp[
                        :, dy * d : dy * d + h, dxi * d : dxi * d + w, :
                    ].astype(jnp.float32)
                    * g.astype(jnp.float32),
                    axis=(0, 1, 2),
                )
            )
        dk.append(jnp.stack(row))
    dk = jnp.stack(dk)[:, :, None, :]  # (3, 3, 1, C)
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


depthwise3x3_shiftbwd.defvjp(_dw_shiftbwd_fwd, _dw_shiftbwd_bwd)
