"""Basic conv blocks (reference: ``segmentron/modules/basic.py``).

NHWC / HWIO throughout (TPU-native layout). Convolutions use explicit
symmetric padding to match torch's integer ``padding=`` semantics, and
``use_bias=False`` wherever a norm follows (reference convention).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.quant import observe_amax, site_amax
from .batch_norm import NormConfig

__all__ = ["conv2d", "ConvBNReLU", "SeparableConv2d", "InvertedResidual"]


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(
    features: int,
    kernel_size: Union[int, Sequence[int]] = 3,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int], str, None] = None,
    dilation: Union[int, Sequence[int]] = 1,
    groups: int = 1,
    use_bias: bool = False,
    name: Optional[str] = None,
) -> nn.Conv:
    """torch-``Conv2d``-parameterised flax Conv (NHWC/HWIO).

    ``padding=None`` means the torch-reference default of
    ``dilation * (k - 1) // 2`` ('same' for odd kernels), which is what
    the reference uses for every 3x3.
    """
    k = _pair(kernel_size)
    d = _pair(dilation)
    if padding is None:
        padding = (d[0] * (k[0] - 1) // 2, d[1] * (k[1] - 1) // 2)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(padding, (tuple, list)):
        padding = [(padding[0], padding[0]), (padding[1], padding[1])]
    return nn.Conv(
        features=features,
        kernel_size=k,
        strides=_pair(stride),
        padding=padding,
        kernel_dilation=d,
        feature_group_count=groups,
        use_bias=use_bias,
        name=name,
    )


class ConvBNReLU(nn.Module):
    """Conv -> Norm -> activation (reference ``_ConvBNReLU``/``_ConvBNPReLU``).

    Accepts a ``QTensor`` (static-int8 inference path, ops/quant.py) and
    then also RETURNS one: the conv runs s8 x s8 -> s32 on the MXU with
    the folded-BN + relu + requant epilogue fused, so the materialized
    activation stays int8 (traffic) and the matmul runs at int8 rate."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int], None] = None
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    norm: NormConfig = NormConfig()
    act: Optional[Callable] = nn.relu

    def _numeric_padding(self) -> Tuple[int, int]:
        k = _pair(self.kernel_size)
        d = _pair(self.dilation)
        p = self.padding
        if p is None:
            p = (d[0] * (k[0] - 1) // 2, d[1] * (k[1] - 1) // 2)
        return _pair(p)

    def _wblock(self, x) -> Optional[int]:
        """W-block size for the stem fast path (ops/stem.py), or None."""
        from ..config import cfg
        from ..ops.stem import pick_block

        if not bool(cfg.TPU.STEM_WBLOCK) or not hasattr(x, "shape"):
            return None
        return pick_block(
            x.shape,
            _pair(self.kernel_size),
            _pair(self.stride),
            self._numeric_padding(),
            _pair(self.dilation),
            self.groups,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.quant import QTensor, bn_amax, bn_folded_affine, qconv

        if isinstance(x, QTensor) and self.act not in (nn.relu, None):
            from ..ops.quant import dequantize

            x = dequantize(x)  # relu6 etc: epilogue only fuses plain relu
        if isinstance(x, QTensor):
            from ..config import cfg

            in_ch = x.q.shape[-1]
            k = _pair(self.kernel_size)
            w = _SharedKernel(
                (k[0], k[1], in_ch // self.groups, self.features), name="conv"
            )()
            s, b, m, v = _SharedBN(name="bn")(self.features)
            a_bn, b_bn = bn_folded_affine(s, b, m, v, self.norm.eps)
            amax = bn_amax(a_bn, b_bn, k=float(cfg.TPU.INT8_K))
            return qconv(
                x, w, self.stride, self.padding, self.dilation, self.groups,
                bn_affine=(a_bn, b_bn), relu=self.act is not None,
                out_amax=amax,
            )

        blk = self._wblock(x)
        if blk is not None:
            from ..ops.stem import wblock_conv2d

            k = _pair(self.kernel_size)
            w = _SharedKernel(
                (k[0], k[1], x.shape[-1], self.features), name="conv"
            )()
            x = wblock_conv2d(
                x, w, _pair(self.stride), self._numeric_padding(), blk
            )
        else:
            x = conv2d(
                self.features,
                self.kernel_size,
                self.stride,
                self.padding,
                self.dilation,
                self.groups,
                name="conv",
            )(x)
        x = self.norm.make(name="bn")(x, use_running_average=not train)
        if self.act is not None:
            x = self.act(x)
        return x


class _SharedKernel(nn.Module):
    """Shadow declaration of an nn.Conv 'kernel' param (same scope/name)
    so the fused Pallas path reads the weights the regular path owns."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class _SharedBN(nn.Module):
    """Shadow declaration of an nn.BatchNorm's variables (scale/bias +
    running mean/var), matching names and shapes."""

    @nn.compact
    def __call__(self, ch: int):
        scale = self.param("scale", nn.initializers.ones, (ch,))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((ch,)))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((ch,)))
        return scale, bias, mean.value, var.value


class _SepParams(nn.Module):
    """Shadow declaration of a ``SeparableConv2d``'s variables (same
    scope/param names) so a block-fused kernel can read the weights the
    regular module owns. Returns (dw_kernel, dw_bn, pw_kernel, pw_bn)
    with each bn as (scale, bias, mean, var)."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        dw = _SharedKernel((3, 3, 1, in_ch), name="depthwise")()
        bn1 = _SharedBN(name="dw_bn")(in_ch)
        pw = _SharedKernel((1, 1, in_ch, self.features), name="pointwise")()
        bn2 = _SharedBN(name="pw_bn")(self.features)
        return dw, bn1, pw, bn2


class _ConvBNParams(nn.Module):
    """Shadow declaration of a ``ConvBNReLU``'s variables (scope names
    ``conv``/``bn``) for fused-kernel paths (e.g. ops/entrychain.py's
    fused stem)."""

    shape: Tuple[int, ...]  # HWIO

    @nn.compact
    def __call__(self):
        w = _SharedKernel(self.shape, name="conv")()
        bn = _SharedBN(name="bn")(self.shape[-1])
        return w, bn


class SeparableConv2d(nn.Module):
    """Depthwise 3x3 (+norm[/relu]) then pointwise 1x1 (+norm).

    Reference ``SeparableConv2d`` — the workhorse of Xception and the
    DeepLabv3+ decoder. ``relu_first=False`` matches the reference's
    aligned-Xception block ordering (dw -> BN -> pw -> BN), with an
    optional ReLU between dw-BN and pw as in the decoder blocks.

    Inference fast path (default OFF, ``cfg.TPU.USE_PALLAS_SEPCONV``):
    eval-mode stride-1 3x3 blocks with plain/sync/frozen BN can run as
    one fused Pallas kernel (``ops.sepconv``) with both BNs folded.
    Model-level measurement showed XLA's conv path is faster on v5e
    (BASELINE.md), so the kernel is a reference implementation.
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    dilation: Union[int, Sequence[int]] = 1
    norm: NormConfig = NormConfig()
    relu_first: bool = True
    chain: bool = False  # set by XceptionBlock when the whole block is
    #   a pallas chain: forces the v3 kernel (pallas->pallas hops are
    #   free; isolated pallas layers between XLA convs pay ~1.3 ms of
    #   relayout per boundary — BASELINE.md)

    def _fusable(self, x, train: bool) -> bool:
        from ..config import cfg
        from ..ops.sepconv import sepconv_vmem_ok

        if train or self.is_initializing():
            return False
        if not bool(cfg.TPU.USE_PALLAS_SEPCONV):
            return False
        import os

        interpret = os.environ.get("SEGMENTRON_PALLAS_INTERPRET") == "1"
        if not interpret and jax.default_backend() not in ("tpu",):
            return False
        if _pair(self.kernel_size) != (3, 3) or _pair(self.stride) != (1, 1):
            return False
        d = _pair(self.dilation)
        if d[0] != d[1]:
            return False
        if self.norm.bn_type not in ("BN", "SyncBN", "FrozenBN"):
            return False
        n, h, w, c = x.shape
        tile = self._tile_h(h, w, c, d[0])
        return tile is not None

    def _tile_h(self, h, w, c, d):
        from ..ops.sepconv import sepconv_vmem_ok

        for tile in (16, 8, 4):
            if h % tile == 0 and h >= tile + 2 * d and sepconv_vmem_ok(
                h, w, c, self.features, d, tile_h=tile
            ):
                return tile
        return None

    def _dw_shift(self) -> bool:
        """Route the depthwise conv through the shifted-slice VPU path
        (ops/dwconv.py) — measured faster than XLA's dilated-depthwise
        lowering at rates >= 12 (the ASPP/DenseASPP atrous branches)."""
        from ..config import cfg
        from ..ops.dwconv import prefer_shift

        return bool(cfg.TPU.DW_SHIFT) and prefer_shift(
            _pair(self.kernel_size), _pair(self.stride), _pair(self.dilation)
        )

    def _dw_bwd_shift(self) -> bool:
        """Hybrid depthwise routing: XLA conv forward + shift-MAC
        custom VJP (ops/dwconv.py::depthwise3x3_shiftbwd). Gated to the
        3x3 stride-1 square-dilation geometry the op implements."""
        from ..config import cfg

        return (
            bool(cfg.TPU.DW_BWD_SHIFT)
            and _pair(self.kernel_size) == (3, 3)
            and _pair(self.stride) == (1, 1)
            and _pair(self.dilation)[0] == _pair(self.dilation)[1]
        )

    def _int8_pw_mode(self, train: bool) -> bool:
        """Mixed precision-of-storage mode ("pw"): depthwise stays bf16
        (its int8 lowering measured slower on v5e), but the dw->pw hop
        is quantized so the pointwise matmul runs s8 x s8 on the MXU —
        the fastest measured sepconv variant (BASELINE.md)."""
        from ..config import cfg

        if train or self.is_initializing():
            return False
        if cfg.TPU.INT8_ACTIVATIONS != "pw" or bool(cfg.TPU.INT8_CALIBRATE):
            return False
        return self.norm.bn_type in ("BN", "SyncBN", "FrozenBN")

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.quant import QTensor

        if isinstance(x, QTensor):
            return self._int8_forward(x)
        if self._int8_pw_mode(train):
            return self._int8_pw_forward(x)
        in_ch = x.shape[-1]
        if self._fusable(x, train):
            import os

            from ..ops.sepconv import fused_sepconv_infer_v2

            d = _pair(self.dilation)[0]
            dw_k = _SharedKernel((3, 3, 1, in_ch), name="depthwise")()
            s1, b1, m1, v1 = _SharedBN(name="dw_bn")(in_ch)
            pw_k = _SharedKernel((1, 1, in_ch, self.features), name="pointwise")()
            s2, b2, m2, v2 = _SharedBN(name="pw_bn")(self.features)
            eps = self.norm.eps
            mid_scale = s1 * jax.lax.rsqrt(v1 + eps)
            mid_bias = b1 - m1 * mid_scale
            out_scale = s2 * jax.lax.rsqrt(v2 + eps)
            out_bias = b2 - m2 * out_scale
            return fused_sepconv_infer_v2(
                x, dw_k, mid_scale, mid_bias, pw_k, out_scale, out_bias,
                dilation=d, pre_relu=self.relu_first,
                tile_h=self._tile_h(x.shape[1], x.shape[2], in_ch, d),
                interpret=os.environ.get("SEGMENTRON_PALLAS_INTERPRET") == "1",
            )

        if self.relu_first:
            x = nn.relu(x)
        if self._dw_shift():
            from ..ops.dwconv import depthwise_shift3x3

            kk = _pair(self.kernel_size)
            dw_k = _SharedKernel((kk[0], kk[1], 1, in_ch), name="depthwise")()
            x = depthwise_shift3x3(
                x, dw_k.astype(x.dtype), _pair(self.dilation)[0]
            )
        elif self._dw_bwd_shift():
            # XLA conv forward + shift-MAC custom VJP (training probe,
            # cfg.TPU.DW_BWD_SHIFT rationale in config/settings.py)
            from ..ops.dwconv import depthwise3x3_shiftbwd

            dw_k = _SharedKernel((3, 3, 1, in_ch), name="depthwise")()
            x = depthwise3x3_shiftbwd(
                x, dw_k.astype(x.dtype), _pair(self.dilation)[0]
            )
        else:
            x = conv2d(
                in_ch,
                self.kernel_size,
                self.stride,
                None,
                self.dilation,
                groups=in_ch,
                name="depthwise",
            )(x)
        x = self.norm.make(name="dw_bn")(x, use_running_average=not train)
        observe_amax(self, "dw_bn", x)
        x = conv2d(self.features, 1, 1, 0, 1, name="pointwise")(x)
        x = self.norm.make(name="pw_bn")(x, use_running_average=not train)
        observe_amax(self, "pw_bn", x)
        return x

    def _v3_tile(self, x) -> Optional[int]:
        """tile_h for the fused v3 Pallas sepconv, or None for the XLA
        path. Only ``chain=True`` layers (inside an XceptionBlock that
        runs block-fused) use the kernel: isolated pallas layers lose
        their per-layer win to the XLA<->pallas relayout boundaries."""
        import os

        from ..config import cfg
        from ..ops.sepconv import v3_vmem_ok

        if not self.chain or not bool(cfg.TPU.FUSED_SEPCONV_V3):
            return None
        interpret = os.environ.get("SEGMENTRON_PALLAS_INTERPRET") == "1"
        if not interpret and jax.default_backend() != "tpu":
            return None
        if _pair(self.kernel_size) != (3, 3) or _pair(self.stride) != (1, 1):
            return None
        d = _pair(self.dilation)
        if d[0] != d[1]:
            return None
        n, h, w, c = x.shape
        co = self.features
        for tile in (8, 4):
            if (
                tile % d[0] == 0
                and h % tile == 0
                and h >= 2 * tile
                and v3_vmem_ok(h, w, c, co, d[0], tile)
            ):
                return tile
        return None

    def _int8_pw_forward(self, x):
        """bf16 depthwise -> folded-BN -> quantize (int8 materializes)
        -> int8 pointwise -> folded-BN -> back to the input dtype.

        Large stride-1 layers instead run the fused v3 Pallas kernel
        (``ops/sepconv.py``): same math, but the dw intermediate and
        its int8 copy never touch HBM and the requant happens
        in-register before an s8 x s8 MXU matmul."""
        from ..config import cfg
        from ..ops.quant import (
            bn_amax, bn_folded_affine, qconv, quantize_static,
        )

        in_ch = x.shape[-1]
        out_dtype = x.dtype
        kk = _pair(self.kernel_size)
        dw_k = _SharedKernel((kk[0], kk[1], 1, in_ch), name="depthwise")()
        s1, b1, m1, v1 = _SharedBN(name="dw_bn")(in_ch)
        pw_k = _SharedKernel((1, 1, in_ch, self.features), name="pointwise")()
        s2, b2, m2, v2 = _SharedBN(name="pw_bn")(self.features)
        a1, c1 = bn_folded_affine(s1, b1, m1, v1, self.norm.eps)
        a2, c2 = bn_folded_affine(s2, b2, m2, v2, self.norm.eps)

        tile = self._v3_tile(x)
        if tile is not None:
            import os

            from ..ops.sepconv import fold_sepconv_int8, fused_sepconv_infer_v3

            ms, mb, wq, osc = fold_sepconv_int8(
                a1, c1, pw_k, a2, k_sigma=float(cfg.TPU.INT8_K)
            )
            return fused_sepconv_infer_v3(
                x, dw_k, ms, mb, wq, osc, c2,
                dilation=_pair(self.dilation)[0], pre_relu=self.relu_first,
                tile_h=tile, int8_dot=True,
                interpret=os.environ.get("SEGMENTRON_PALLAS_INTERPRET") == "1",
            )

        if self.relu_first:
            x = nn.relu(x)
        d = _pair(self.dilation)
        if self._dw_shift():
            from ..ops.dwconv import depthwise_shift3x3

            # out_dtype=f32: keep the 9-tap accumulator unrounded into
            # the BN fold + quantizer, matching the conv path's
            # preferred_element_type=f32 (ADVICE r2: the bf16 roundtrip
            # was a systematic divergence between the two routes)
            y = depthwise_shift3x3(
                x, dw_k.astype(x.dtype), d[0], out_dtype=jnp.float32
            )
        else:
            pad = (d[0] * (kk[0] - 1) // 2, d[1] * (kk[1] - 1) // 2)
            y = jax.lax.conv_general_dilated(
                x,
                dw_k.astype(x.dtype),
                window_strides=_pair(self.stride),
                padding=[(pad[0], pad[0]), (pad[1], pad[1])],
                rhs_dilation=d,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=in_ch,
                preferred_element_type=jnp.float32,
            )
        y = y * a1 + c1
        # calibrated (measured) amax when a quant_amax collection is
        # loaded; 6-sigma BN heuristic otherwise
        amax1 = site_amax(
            self, "dw_bn", bn_amax(a1, c1, k=float(cfg.TPU.INT8_K))
        )
        q = quantize_static(y, amax1)
        y = qconv(q, pw_k, 1, 0, 1, bn_affine=(a2, c2))
        return y.astype(out_dtype)

    def _int8_forward(self, x):
        """Static-int8 inference (ops/quant.py): relu in the int8
        domain, both convs s8 x s8 -> s32 with folded-BN + requant
        epilogues; the materialized dw/pw activations are int8."""
        from ..config import cfg
        from ..ops.quant import (
            QTensor, bn_amax, bn_folded_affine, qconv, qrelu,
        )

        in_ch = x.q.shape[-1]
        k = float(cfg.TPU.INT8_K)
        kk = _pair(self.kernel_size)
        dw_k = _SharedKernel((kk[0], kk[1], 1, in_ch), name="depthwise")()
        s1, b1, m1, v1 = _SharedBN(name="dw_bn")(in_ch)
        pw_k = _SharedKernel((1, 1, in_ch, self.features), name="pointwise")()
        s2, b2, m2, v2 = _SharedBN(name="pw_bn")(self.features)
        a1, c1 = bn_folded_affine(s1, b1, m1, v1, self.norm.eps)
        a2, c2 = bn_folded_affine(s2, b2, m2, v2, self.norm.eps)
        if self.relu_first:
            x = qrelu(x)
        y = qconv(
            x, dw_k, self.stride, None, self.dilation, groups=in_ch,
            bn_affine=(a1, c1),
            out_amax=site_amax(self, "dw_bn", bn_amax(a1, c1, k=k)),
        )
        return qconv(
            y, pw_k, 1, 0, 1, bn_affine=(a2, c2),
            out_amax=site_amax(self, "pw_bn", bn_amax(a2, c2, k=k)),
        )


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (reference block; lives here since
    the seg decoder reuses it)."""

    features: int
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_res = self.stride == 1 and in_ch == self.features
        y = x
        if self.expand_ratio != 1:
            y = ConvBNReLU(
                hidden, 1, 1, 0, norm=self.norm, act=nn.relu6, name="expand"
            )(y, train)
        y = ConvBNReLU(
            hidden,
            3,
            self.stride,
            None,
            self.dilation,
            groups=hidden,
            norm=self.norm,
            act=nn.relu6,
            name="depthwise",
        )(y, train)
        y = conv2d(self.features, 1, 1, 0, name="project")(y)
        y = self.norm.make(name="project_bn")(y, use_running_average=not train)
        return x + y if use_res else y
