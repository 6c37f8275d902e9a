"""Fused separable-conv inference kernel (Pallas).

Why: DeepLabv3+/Xception-65 at 1024x2048 measures HBM-bandwidth-bound
(~17 GB/img effective vs 819 GB/s on v5e — see BASELINE.md), and XLA
does not fuse conv->conv, so every SeparableConv2d round-trips its
depthwise intermediate (same size as the input) through HBM. This
kernel computes

    [relu ->] dw3x3(dilated) -> BN(folded) -> pw1x1 -> BN(folded)

entirely in VMEM per (batch, row-tile) grid cell: the depthwise taps
are 9 shifted VPU multiply-adds on a haloed row tile, the pointwise is
one (TILE_H*W, C) x (C, Co) MXU matmul, and only the final output is
written back — eliminating the intermediate's write+read.

Inference-only (BN folded from running stats); training keeps the XLA
path. Halo rows are DMA'd with clamped ranges, so no pre-padded copy
of the input is materialized.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fold_sepconv_int8",
    "fused_sepconv_infer",
    "fused_sepconv_infer_v3",
    "fused_sepconv_infer_v3_skip",
    "sepconv_ref",
    "sepconv_vmem_ok",
    "v3_skip_vmem_ok",
    "v3_vmem_ok",
]


def fold_sepconv_int8(mid_scale, mid_bias, pw_kernel, out_scale, k_sigma=6.0):
    """Fold the dw->pw requant scale for ``fused_sepconv_infer_v3``'s
    ``int8_dot`` path: mid affine coefficients absorb 1/s_mid (so the
    kernel only rounds), the pointwise weights are per-out-channel int8
    with the per-IN-channel s_mid pre-folded (exact), and the weight
    scales ride out on the output affine. Numerics match the XLA
    "pw"-mode path in ``ops/quant.py`` (same bn_amax static ranges).
    """
    from .quant import bn_amax, fold_and_quantize_weights

    c = pw_kernel.shape[-2] if pw_kernel.ndim == 4 else pw_kernel.shape[0]
    pw = pw_kernel.reshape(c, -1)
    amax = bn_amax(mid_scale, mid_bias, k=k_sigma)
    s_mid = amax / 127.0
    w_q, s_w = fold_and_quantize_weights(
        pw[None, None].astype(jnp.float32), s_mid
    )
    return (
        mid_scale / s_mid,
        mid_bias / s_mid,
        w_q.reshape(c, -1),
        out_scale.astype(jnp.float32) * s_w,
    )


def sepconv_ref(x, dw_kernel, mid_scale, mid_bias, pw_kernel, out_scale,
                out_bias, dilation: int = 1, pre_relu: bool = False):
    """XLA reference with identical semantics (parity oracle/fallback)."""
    c = x.shape[-1]
    if pre_relu:
        x = jax.nn.relu(x)
    d = (dilation, dilation)
    y = jax.lax.conv_general_dilated(
        x, dw_kernel, (1, 1), [(dilation, dilation)] * 2,
        rhs_dilation=d, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    y = y * mid_scale + mid_bias
    out = jnp.einsum("nhwc,co->nhwo", y, pw_kernel,
                     preferred_element_type=jnp.float32)
    return (out * out_scale + out_bias).astype(x.dtype)


def _kernel(x_hbm, dwk_ref, mid_ref, pwk_ref, outsb_ref, o_ref, xv, sem, *,
            tile_h: int, d: int, pre_relu: bool, h: int, w: int):
    i = pl.program_id(1)
    y0 = i * tile_h
    rows = tile_h + 2 * d
    b = pl.program_id(0)

    # ---- haloed row tile: scratch row r <-> source row (y0 - d + r).
    # Mosaic DMA constraints (measured on v5e): lane dim (C) must be a
    # multiple of 128 and only untiled leading dims may be offset — so
    # the scratch holds FULL-WIDTH rows (no side columns; the W halo is
    # applied in-register below) and the transfer is a body plus two
    # conditional halo copies (skipped halos stay zero = conv padding).
    xv[: d] = jnp.zeros((d,) + xv.shape[1:], xv.dtype)
    xv[d + tile_h :] = jnp.zeros((d,) + xv.shape[1:], xv.dtype)

    body = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(y0, tile_h)], xv.at[pl.ds(d, tile_h)], sem.at[0]
    )
    body.start()

    @pl.when(y0 >= d)
    def _top():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(y0 - d, d)], xv.at[pl.ds(0, d)], sem.at[1]
        )
        cp.start()
        cp.wait()

    @pl.when(y0 + tile_h + d <= h)
    def _bottom():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(y0 + tile_h, d)],
            xv.at[pl.ds(d + tile_h, d)],
            sem.at[2],
        )
        cp.start()
        cp.wait()

    body.wait()

    xt = xv[...]
    if pre_relu:
        # halo zero-padding survives relu: relu(0) = 0
        xt = jnp.maximum(xt, 0)
    # W halo in-register (VPU shift, no memory traffic)
    xt = jnp.pad(xt, ((0, 0), (d, d), (0, 0)))

    # ---- depthwise 3x3 (dilated): 9 statically-shifted VPU FMAs in fp32
    dwk = dwk_ref[...].astype(jnp.float32)  # (3, 3, C)
    acc = jnp.zeros((tile_h, w, xt.shape[-1]), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            win = xt[ky * d : ky * d + tile_h, kx * d : kx * d + w].astype(
                jnp.float32
            )
            acc = acc + win * dwk[ky, kx][None, None, :]

    mid = mid_ref[...].astype(jnp.float32)  # (2, C): scale, bias
    acc = acc * mid[0][None, None, :] + mid[1][None, None, :]

    # ---- pointwise 1x1: one MXU matmul over the flattened tile
    pwk = pwk_ref[...]
    c = pwk.shape[0]
    out = jnp.dot(
        acc.reshape(tile_h * w, c).astype(pwk.dtype), pwk,
        preferred_element_type=jnp.float32,
    )
    osb = outsb_ref[...].astype(jnp.float32)  # (2, Co)
    out = out * osb[0][None, :] + osb[1][None, :]
    o_ref[0] = out.reshape(tile_h, w, -1).astype(o_ref.dtype)


def sepconv_vmem_ok(h: int, w: int, c: int, c_out: int, dilation: int,
                    dtype_bytes: int = 2, tile_h: int = 8,
                    budget: int = 12 * 1024 * 1024) -> bool:
    """Shape admissibility for the pipelined (v2) fused kernel: VMEM fit
    with double-buffered input/halo/output blocks. (The v1 manual-DMA
    kernel additionally needed 128-aligned channels; v2 uses standard
    BlockSpec pipelining and has no alignment constraint.)"""
    d = dilation
    blocks = 2 * (tile_h + 2 * d) * w * c * dtype_bytes  # double-buffered in
    acc = (tile_h + 2 * d) * (w + 2 * d) * c * 4  # padded fp32 working set
    out = tile_h * w * c_out * 4 + 2 * tile_h * w * c_out * dtype_bytes
    weights = c * c_out * dtype_bytes + 9 * c * 4
    return (blocks + acc + out + weights) < budget and h % tile_h == 0


def _kernel_v2(x_ref, top_ref, bot_ref, dwk_ref, mid_ref, pwk_ref,
               outsb_ref, o_ref, *, tile_h: int, d: int, pre_relu: bool,
               w: int):
    """Pipelined variant: x arrives as a standard VMEM block (Mosaic
    double-buffers it); the d halo rows above/below come as thin side
    inputs precomputed in XLA. No manual DMA -> no lane-alignment
    constraints, works at any channel width."""
    xt = jnp.concatenate([top_ref[0, 0], x_ref[0], bot_ref[0, 0]], axis=0)
    if pre_relu:
        xt = jnp.maximum(xt, 0)
    xt = jnp.pad(xt, ((0, 0), (d, d), (0, 0)))

    dwk = dwk_ref[...].astype(jnp.float32)
    acc = jnp.zeros((tile_h, w, xt.shape[-1]), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            win = xt[ky * d : ky * d + tile_h, kx * d : kx * d + w].astype(
                jnp.float32
            )
            acc = acc + win * dwk[ky, kx][None, None, :]
    mid = mid_ref[...].astype(jnp.float32)
    acc = acc * mid[0][None, None, :] + mid[1][None, None, :]

    pwk = pwk_ref[...]
    c = pwk.shape[0]
    out = jnp.dot(
        acc.reshape(tile_h * w, c).astype(pwk.dtype), pwk,
        preferred_element_type=jnp.float32,
    )
    osb = outsb_ref[...].astype(jnp.float32)
    out = out * osb[0][None, :] + osb[1][None, :]
    o_ref[0] = out.reshape(tile_h, w, -1).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "pre_relu", "tile_h", "interpret"),
)
def fused_sepconv_infer_v2(
    x, dw_kernel, mid_scale, mid_bias, pw_kernel, out_scale, out_bias,
    dilation: int = 1, pre_relu: bool = False, tile_h: int = 8,
    interpret: bool = False,
):
    """Pipelined fused sepconv: halo rows are built in XLA (cheap fused
    gathers), the main tile streams through Mosaic's double-buffered
    pipeline. Same semantics as :func:`fused_sepconv_infer`."""
    n, h, w, c = x.shape
    d = dilation
    if dw_kernel.ndim == 4:
        dw_kernel = dw_kernel.reshape(3, 3, c)
    if pw_kernel.ndim == 4:
        pw_kernel = pw_kernel.reshape(c, -1)
    co = pw_kernel.shape[-1]
    assert h % tile_h == 0 and h >= tile_h, (h, tile_h)
    nt = h // tile_h
    mid = jnp.stack([mid_scale, mid_bias]).astype(jnp.float32)
    osb = jnp.stack([out_scale, out_bias]).astype(jnp.float32)

    # halo side inputs: tops[i] = x rows [i*T-d, i*T), bots[i] = rows
    # [i*T+T, i*T+T+d), zero outside the image
    xr = x.reshape(n, nt, tile_h, w, c)
    zero = jnp.zeros((n, 1, d, w, c), x.dtype)
    tops = jnp.concatenate([zero, xr[:, :-1, tile_h - d :]], axis=1)
    bots = jnp.concatenate([xr[:, 1:, :d], zero], axis=1)

    out = pl.pallas_call(
        functools.partial(
            _kernel_v2, tile_h=tile_h, d=d, pre_relu=pre_relu, w=w
        ),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, w, c), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, w, c), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, co), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        interpret=interpret,
    )(x, tops, bots, dw_kernel, mid, pw_kernel, osb)
    return out


def v3_vmem_ok(h: int, w: int, c: int, co: int, d: int, tile_h: int,
               budget: int = 23 * 1024 * 1024) -> bool:
    """Live-buffer VMEM estimate for ``fused_sepconv_infer_v3``,
    calibrated like :func:`v3_skip_vmem_ok` (overcounts XLA's scoped
    vmem by ~1.45x; limit 16 MB). Every flagship entry-flow shape up
    to (tile 8, w 1024, c 728) compiled and ran on v5e under this
    budget; anything estimated larger falls back to a smaller tile."""
    center = 2 * tile_h * w * c * 2           # double-buffered input
    halos = 4 * d * w * c * 2
    xt = (tile_h + 2 * d) * (w + 2 * d) * c * 2
    acc = tile_h * w * c * 4                  # fp32 dw accumulator
    out = 2 * tile_h * w * co * 2 + tile_h * w * co * 4
    wts = c * co * 2 + 9 * c * 4 + 2 * (c + co) * 4
    return (center + halos + xt + acc + out + wts) < budget


def _kernel_v3(x_ref, top_ref, bot_ref, dwk_ref, mid_ref, pwk_ref,
               osb_ref, o_ref, *, tile_h: int, d: int, pre_relu: bool,
               w: int, int8_dot: bool):
    """v3: halo rows arrive as two thin OVERLAPPING block streams over
    the same input array (index maps offset by ±1 d-row-block, clamped
    at the edges and masked to zero here) — nothing is materialized on
    the XLA side and Mosaic pipelines all three streams. Optionally the
    depthwise output is quantized in-register so the pointwise runs
    s8 x s8 -> s32 on the MXU (2x bf16 rate); the quantization never
    touches HBM so it is numerically identical to the shipped
    "pw"-mode XLA path (ops/quant.py) minus its int8 round-trip."""
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    top = top_ref[0]
    bot = bot_ref[0]
    top = jnp.where(i == 0, jnp.zeros_like(top), top)
    bot = jnp.where(i == nt - 1, jnp.zeros_like(bot), bot)
    xt = jnp.concatenate([top, x_ref[0], bot], axis=0)
    if pre_relu:
        xt = jnp.maximum(xt, 0)
    xt = jnp.pad(xt, ((0, 0), (d, d), (0, 0)))

    dwk = dwk_ref[...].astype(jnp.float32)  # (3, 3, C)
    acc = jnp.zeros((tile_h, w, xt.shape[-1]), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            win = xt[ky * d : ky * d + tile_h, kx * d : kx * d + w].astype(
                jnp.float32
            )
            acc = acc + win * dwk[ky, kx][None, None, :]

    # mid affine; for int8_dot the 1/s_mid requant scale is pre-folded
    # into these coefficients, so rounding is all that is left to do
    mid = mid_ref[...].astype(jnp.float32)  # (2, C)
    acc = acc * mid[0][None, None, :] + mid[1][None, None, :]

    c = pwk_ref.shape[0]
    if int8_dot:
        q = jnp.clip(jnp.round(acc), -127.0, 127.0).astype(jnp.int8)
        out = jnp.dot(
            q.reshape(tile_h * w, c), pwk_ref[...],
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        out = jnp.dot(
            acc.reshape(tile_h * w, c).astype(pwk_ref.dtype), pwk_ref[...],
            preferred_element_type=jnp.float32,
            precision=_f32_precision(pwk_ref.dtype),
        )
    osb = osb_ref[...].astype(jnp.float32)  # (2, Co)
    out = out * osb[0][None, :] + osb[1][None, :]
    o_ref[0] = out.reshape(tile_h, w, -1).astype(o_ref.dtype)


def _sepconv_core(xt, dwk_ref, mid_ref, pwk_ref, osb_ref, *, t_out: int,
                  d: int, stride: int, w: int, int8_dot: bool,
                  pre_relu: bool):
    """Shared v3 kernel body: [relu ->] strided/dilated dw 3x3 ->
    folded-BN [-> int8 requant] -> pointwise matmul -> folded-BN.
    ``xt`` is the haloed row tile (stride*t_out + 2d rows, w cols).

    Mosaic cannot extract stride-2 vector slices, so stride 2 is
    handled as: rows deinterleaved for free by splitting the UNTILED
    leading dim (reshape touches neither sublane nor lane dims),
    columns computed at FULL width — the caller subsamples columns
    with one cheap XLA slice after the pallas call. Returns the fp32
    (t_out, w, Co) pre-skip output (full width even when strided)."""
    if pre_relu:
        xt = jnp.maximum(xt, 0)
    xt = jnp.pad(xt, ((0, 0), (d, d), (0, 0)))
    c = pwk_ref.shape[0]
    if stride == 1:
        def sel(ky):
            return xt[ky * d : ky * d + t_out]
    else:  # stride 2: row r of the output tile reads source row 2r+ky*d
        xtr = xt.reshape(xt.shape[0] // 2, 2, w + 2 * d, xt.shape[-1])

        def sel(ky):
            o, p = (ky * d) // 2, (ky * d) % 2
            return xtr[o : o + t_out, p]

    dwk = dwk_ref[...].astype(jnp.float32)  # (3, 3, C)
    acc = jnp.zeros((t_out, w, xt.shape[-1]), jnp.float32)
    for ky in range(3):
        rows = sel(ky)
        for kx in range(3):
            win = rows[:, kx * d : kx * d + w].astype(jnp.float32)
            acc = acc + win * dwk[ky, kx][None, None, :]
    mid = mid_ref[...].astype(jnp.float32)  # (2, C)
    acc = acc * mid[0][None, None, :] + mid[1][None, None, :]

    if int8_dot:
        q = jnp.clip(jnp.round(acc), -127.0, 127.0).astype(jnp.int8)
        out = jnp.dot(
            q.reshape(t_out * w, c), pwk_ref[...],
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        out = jnp.dot(
            acc.reshape(t_out * w, c).astype(pwk_ref.dtype), pwk_ref[...],
            preferred_element_type=jnp.float32,
            precision=_f32_precision(pwk_ref.dtype),
        )
    osb = osb_ref[...].astype(jnp.float32)  # (2, Co)
    return out.reshape(t_out, w, -1) * osb[0] + osb[1]


def _f32_precision(dtype):
    """HIGHEST for f32 operands so fp32 parity tests are exact (the
    default f32 matmul precision is reduced); None (native MXU) for
    the production bf16/int8 operands."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _kernel_v3_skip(x_ref, top_ref, bot_ref, xin_ref, dwk_ref, mid_ref,
                    pwk_ref, osb_ref, skw_ref, ska_ref, o_ref, *,
                    t_out: int, d: int, stride: int, pre_relu: bool,
                    w: int, int8_dot: bool, skip: str):
    """v3 block-end kernel: the main sepconv (optionally strided) plus
    the block's residual — either the reference 1x1(+BN) conv skip
    computed in-kernel as one MXU matmul over the stride-picked input
    rows/cols, or an identity 'sum' skip — fused into the epilogue, so
    a whole XceptionBlock chains pallas->pallas with no XLA boundary
    (each XLA<->pallas hop costs a relayout copy, BASELINE.md)."""
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    top = top_ref[0]
    bot = bot_ref[0]
    top = jnp.where(i == 0, jnp.zeros_like(top), top)
    bot = jnp.where(i == nt - 1, jnp.zeros_like(bot), bot)
    xt = jnp.concatenate([top, x_ref[0], bot], axis=0)
    out = _sepconv_core(
        xt, dwk_ref, mid_ref, pwk_ref, osb_ref, t_out=t_out, d=d,
        stride=stride, w=w, int8_dot=int8_dot, pre_relu=pre_relu,
    )
    if skip == "conv":
        xin = xin_ref[0]
        if stride > 1:
            # even rows only (free leading-dim deinterleave); columns
            # stay full width — the caller's post-slice picks col 2j,
            # which lands exactly on xin[2r, 2j] as the 1x1 stride-2
            # skip conv requires.
            xin = xin.reshape(xin.shape[0] // 2, 2, w, xin.shape[-1])[:, 0]
        cin = xin.shape[-1]
        sk = jnp.dot(
            xin.reshape(t_out * w, cin).astype(skw_ref.dtype),
            skw_ref[...],
            preferred_element_type=jnp.float32,
            precision=_f32_precision(skw_ref.dtype),
        ).reshape(t_out, w, -1)
        ska = ska_ref[...].astype(jnp.float32)  # (2, Co)
        out = out + sk * ska[0] + ska[1]
    else:  # "sum": identity residual, stride must be 1
        out = out + xin_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def v3_skip_vmem_ok(h: int, w: int, c: int, cin: int, co: int, d: int,
                    stride: int, t_out: int,
                    budget: int = 23 * 1024 * 1024) -> bool:
    """Live-buffer VMEM estimate for ``fused_sepconv_infer_v3_skip``.
    The kernel computes FULL-width tiles even when strided (columns are
    subsampled after the call). The budget is calibrated against XLA's
    16 MB scoped-vmem limit: this formula overcounts XLA's scoped
    figure by ~1.45x on the flagship shapes (e.g. est 30.9 MB -> XLA
    21.0 MB for the block1 end at t_out=8, which OOMs; t_out=4 fits)."""
    t_in = stride * t_out
    center = 2 * t_in * w * c * 2
    halos = 4 * d * w * c * 2
    xin = 2 * t_in * w * cin * 2
    xt = (t_in + 2 * d) * (w + 2 * d) * c * 2
    acc = t_out * w * c * 4
    out = 2 * t_out * w * co * 2 + t_out * w * co * 4
    wts = c * co * 2 + cin * co * 2 + 9 * c * 4 + 4 * (c + co) * 4
    return (center + halos + xin + xt + acc + out + wts) < budget


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "stride", "pre_relu", "tile_out",
                     "int8_dot", "skip", "interpret"),
)
def fused_sepconv_infer_v3_skip(
    x, x_in, dw_kernel, mid_scale, mid_bias, pw_kernel, out_scale,
    out_bias, skip_kernel=None, skip_scale=None, skip_bias=None,
    dilation: int = 1, stride: int = 1, pre_relu: bool = False,
    tile_out: int = 8, int8_dot: bool = False, skip: str = "conv",
    interpret: bool = False,
):
    """Block-end fused sepconv: like :func:`fused_sepconv_infer_v3` but
    with the XceptionBlock residual fused in — ``skip='conv'``: a
    1x1 stride-``stride`` conv (+folded BN) of ``x_in`` (the block
    input); ``skip='sum'``: identity add of ``x_in`` (stride 1 only).
    The main depthwise may be strided (the reference puts the block
    stride on the LAST separable conv). Output is (n, h/stride,
    w/stride, Co) in ``x.dtype``.
    """
    n, h, w, c = x.shape
    d = dilation
    if dw_kernel.ndim == 4:
        dw_kernel = dw_kernel.reshape(3, 3, c)
    if pw_kernel.ndim == 4:
        pw_kernel = pw_kernel.reshape(c, -1)
    co = pw_kernel.shape[-1]
    t_in = stride * tile_out
    assert h % t_in == 0 and t_in % d == 0 and w % stride == 0, (
        h, w, stride, tile_out, d)
    assert skip in ("conv", "sum")
    if skip == "sum":
        assert stride == 1 and x_in.shape == (n, h, w, co), x_in.shape
        skip_kernel = jnp.zeros((1, co), x.dtype)
        ska = jnp.zeros((2, co), jnp.float32)
    else:
        if skip_kernel.ndim == 4:
            skip_kernel = skip_kernel.reshape(-1, co)
        skip_kernel = skip_kernel.astype(x.dtype)
        ska = jnp.stack([skip_scale, skip_bias]).astype(jnp.float32)
    cin = x_in.shape[-1]
    nt = h // t_in
    k = t_in // d
    nd = h // d
    mid = jnp.stack([mid_scale, mid_bias]).astype(jnp.float32)
    osb = jnp.stack([out_scale, out_bias]).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _kernel_v3_skip, t_out=tile_out, d=d, stride=stride,
            pre_relu=pre_relu, w=w, int8_dot=int8_dot, skip=skip,
        ),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, t_in, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, d, w, c),
                lambda b, i: (b, jnp.maximum(i * k - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, d, w, c),
                lambda b, i: (b, jnp.minimum((i + 1) * k, nd - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t_in, w, cin) if skip == "conv" else (1, tile_out, w, co),
                lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_out, w, co), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h // stride, w, co), x.dtype),
        interpret=interpret,
    )(x, x, x, x_in, dw_kernel, mid, pw_kernel, osb, skip_kernel, ska)
    if stride > 1:
        # column subsample outside the kernel (Mosaic has no strided
        # vector extract); a plain XLA slice of a pallas output keeps
        # the default layout, so it does NOT reintroduce the
        # conv-boundary relayout this kernel exists to avoid.
        out = out[:, :, ::stride, :]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "pre_relu", "tile_h", "int8_dot",
                     "interpret"),
)
def fused_sepconv_infer_v3(
    x, dw_kernel, mid_scale, mid_bias, pw_kernel, out_scale, out_bias,
    dilation: int = 1, pre_relu: bool = False, tile_h: int = 8,
    int8_dot: bool = False, interpret: bool = False,
):
    """Fused [relu->]dw3x3->BN->pw1x1->BN with halo rows fetched as two
    thin overlapping BlockSpec streams over ``x`` itself (v2 built them
    in XLA, which materialized extra copies of the input — the reason
    it lost to XLA model-level, BASELINE.md).

    With ``int8_dot`` the depthwise output is rounded to int8 entirely
    in VMEM and the pointwise matmul runs s8 x s8 -> s32; callers pass
    ``mid_scale/mid_bias`` pre-divided by the requant scale, an int8
    ``pw_kernel``, and ``out_scale`` carrying the weight scales (see
    ``SeparableConv2d._int8_pw_forward``).

    Requires h % tile_h == 0 and tile_h % dilation == 0.
    """
    n, h, w, c = x.shape
    d = dilation
    if dw_kernel.ndim == 4:
        dw_kernel = dw_kernel.reshape(3, 3, c)
    if pw_kernel.ndim == 4:
        pw_kernel = pw_kernel.reshape(c, -1)
    co = pw_kernel.shape[-1]
    assert h % tile_h == 0 and tile_h % d == 0 and h >= 2 * tile_h, (
        h, tile_h, d)
    nt = h // tile_h
    k = tile_h // d  # d-row blocks per tile
    nd = h // d      # total d-row blocks in x
    mid = jnp.stack([mid_scale, mid_bias]).astype(jnp.float32)
    osb = jnp.stack([out_scale, out_bias]).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _kernel_v3, tile_h=tile_h, d=d, pre_relu=pre_relu, w=w,
            int8_dot=int8_dot,
        ),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            # top halo: the d rows above the tile = d-row-block i*k - 1
            # of x itself (clamped; kernel zero-masks the i == 0 edge)
            pl.BlockSpec(
                (1, d, w, c),
                lambda b, i: (b, jnp.maximum(i * k - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # bottom halo: the d rows below = d-row-block (i+1)*k (clamped)
            pl.BlockSpec(
                (1, d, w, c),
                lambda b, i: (b, jnp.minimum((i + 1) * k, nd - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, co), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        interpret=interpret,
    )(x, x, x, dw_kernel, mid, pw_kernel, osb)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "pre_relu", "tile_h", "interpret"),
)
def fused_sepconv_infer(
    x, dw_kernel, mid_scale, mid_bias, pw_kernel, out_scale, out_bias,
    dilation: int = 1, pre_relu: bool = False, tile_h: int = 8,
    interpret: bool = False,
):
    """x (N,H,W,C) -> (N,H,W,Co). ``dw_kernel`` (3,3,1,C) HWIO-depthwise
    or (3,3,C); ``pw_kernel`` (C,Co) or HWIO (1,1,C,Co). H % tile_h == 0
    (callers pick tile_h via ``sepconv_vmem_ok``)."""
    n, h, w, c = x.shape
    if dw_kernel.ndim == 4:
        dw_kernel = dw_kernel.reshape(3, 3, c)
    if pw_kernel.ndim == 4:
        pw_kernel = pw_kernel.reshape(c, -1)
    co = pw_kernel.shape[-1]
    assert h % tile_h == 0, (h, tile_h)
    mid = jnp.stack([mid_scale, mid_bias]).astype(jnp.float32)  # (2, C)
    osb = jnp.stack([out_scale, out_bias]).astype(jnp.float32)  # (2, Co)

    grid = (n, h // tile_h)
    out = pl.pallas_call(
        functools.partial(
            _kernel, tile_h=tile_h, d=dilation, pre_relu=pre_relu, h=h, w=w
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, co), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * dilation, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x, dw_kernel, mid, pw_kernel, osb)
    return out
