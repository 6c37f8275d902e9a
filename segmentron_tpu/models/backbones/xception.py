"""Aligned Xception-65 / 71 backbone
(reference: ``segmentron/models/backbones/xception.py``).

The DeepLabv3+ encoder: entry flow (stride-2 sep-conv blocks with
1x1-conv residuals), a 16-block middle flow, and a dilated exit flow.
``output_stride`` controls which entry/exit strides become dilations:

- OS16: entry block3 stride 2, exit dilation 2
- OS8:  entry block3 stride 1 + dilation 2, exit dilation 4

Feature taps (SegBaseModel contract): c1 = entry block1 (128ch, /4),
c2 = entry block2 (256ch, /8), c3 = middle-flow out (728ch), c4 = exit
(2048ch).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn

from ...modules.basic import ConvBNReLU, SeparableConv2d, conv2d
from ...modules.batch_norm import NormConfig
from .build import BACKBONE_REGISTRY

__all__ = ["Xception65"]


class XceptionBlock(nn.Module):
    """Three separable convs with an additive skip.

    ``skip_type='conv'`` uses a strided 1x1+BN projection (channel or
    stride mismatch), ``'sum'`` an identity skip, ``'none'`` no skip.
    The last separable conv carries the block stride.
    """

    channels: Sequence[int]
    stride: int = 1
    dilation: int = 1
    skip_type: str = "conv"
    relu_first: bool = True
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ...ops.quant import QTensor

        int8 = isinstance(x, QTensor)
        residual = x
        y = x
        for i, ch in enumerate(self.channels):
            stride = self.stride if i == len(self.channels) - 1 else 1
            y = SeparableConv2d(
                ch,
                3,
                stride=stride,
                dilation=self.dilation,
                norm=self.norm,
                relu_first=self.relu_first,
                name=f"sep{i + 1}",
            )(y, train)
        if self.skip_type == "conv":
            if int8:
                from ...config import cfg
                from ...ops.quant import (
                    bn_amax, bn_folded_affine, qadd, qconv,
                )

                from ...modules.basic import _SharedBN, _SharedKernel

                w = _SharedKernel(
                    (1, 1, x.q.shape[-1], self.channels[-1]), name="skip_conv"
                )()
                s, b, m, v = _SharedBN(name="skip_bn")(self.channels[-1])
                a_bn, b_bn = bn_folded_affine(s, b, m, v, self.norm.eps)
                residual = qconv(
                    x, w, self.stride, 0, bn_affine=(a_bn, b_bn),
                    out_amax=bn_amax(a_bn, b_bn, k=float(cfg.TPU.INT8_K)),
                )
                y = qadd(y, residual)
            else:
                residual = conv2d(
                    self.channels[-1], 1, self.stride, 0, name="skip_conv"
                )(x)
                residual = self.norm.make("skip_bn")(
                    residual, use_running_average=not train
                )
                y = y + residual
        elif self.skip_type == "sum":
            if int8:
                from ...ops.quant import qadd

                y = qadd(y, residual)
            else:
                y = y + residual
        return y


class Xception65(nn.Module):
    output_stride: int = 16
    middle_blocks: int = 16  # 16 -> Xception-65; Xception-71 adds entry blocks
    variant: str = "65"
    norm: NormConfig = NormConfig()

    def _int8_mode(self, train: bool) -> bool:
        from ...config import cfg

        if train or self.is_initializing():
            return False
        if cfg.TPU.INT8_ACTIVATIONS not in (True, "full"):
            return False  # "pw" handles itself inside SeparableConv2d
        return self.norm.bn_type in ("BN", "SyncBN", "FrozenBN")

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        from ...ops.quant import QTensor, dequantize, qrelu, quantize_static

        if self.output_stride == 16:
            entry3_stride, middle_dilation, exit_dilations = 2, 1, (1, 2)
        elif self.output_stride == 8:
            entry3_stride, middle_dilation, exit_dilations = 1, 2, (2, 4)
        else:
            raise ValueError(f"output_stride must be 8 or 16, got {self.output_stride}")

        int8 = self._int8_mode(train)
        if int8:
            # normalized input images: |x| <~ (1-mean)/std ~= 2.6; a
            # static amax of 4 keeps headroom without clipping
            import jax.numpy as jnp

            x = quantize_static(x, jnp.full((x.shape[-1],), 4.0, jnp.float32))

        def tap(t):
            return dequantize(t) if isinstance(t, QTensor) else t

        # entry flow
        x = ConvBNReLU(32, 3, 2, norm=self.norm, name="conv1")(x, train)
        x = ConvBNReLU(64, 3, 1, norm=self.norm, name="conv2")(x, train)
        if self.variant == "71":
            # Xception-71: stride spread over two extra entry blocks
            x = XceptionBlock(
                (128, 128, 128), 2, norm=self.norm, relu_first=False, name="block1a"
            )(x, train)
            x = XceptionBlock(
                (128, 128, 128), 1, norm=self.norm, name="block1"
            )(x, train)
        else:
            x = XceptionBlock(
                (128, 128, 128), 2, norm=self.norm, relu_first=False, name="block1"
            )(x, train)
        c1 = tap(x)  # low-level decoder tap: 128ch at stride 4
        x = XceptionBlock((256, 256, 256), 2, norm=self.norm, name="block2")(x, train)
        c2 = tap(x)
        x = XceptionBlock(
            (728, 728, 728), entry3_stride, norm=self.norm, name="block3"
        )(x, train)

        # middle flow
        for i in range(self.middle_blocks):
            x = XceptionBlock(
                (728, 728, 728),
                1,
                dilation=middle_dilation,
                skip_type="sum",
                norm=self.norm,
                name=f"middle{i + 1}",
            )(x, train)
        c3 = tap(x)

        # exit flow
        x = XceptionBlock(
            (728, 1024, 1024),
            1,
            dilation=exit_dilations[0],
            norm=self.norm,
            name="exit1",
        )(x, train)
        for i, ch in enumerate((1536, 1536, 2048)):
            x = SeparableConv2d(
                ch,
                3,
                dilation=exit_dilations[1],
                norm=self.norm,
                relu_first=False,
                name=f"exit_sep{i + 1}",
            )(x, train)
            x = qrelu(x) if isinstance(x, QTensor) else nn.relu(x)
        return c1, c2, c3, tap(x)


@BACKBONE_REGISTRY.register(name="xception65")
def _xception65(norm: NormConfig, name=None):
    from ...config import cfg

    return Xception65(
        output_stride=int(cfg.MODEL.OUTPUT_STRIDE),
        middle_blocks=int(cfg.MODEL.XCEPTION.MIDDLE_BLOCKS),
        norm=norm,
        name=name,
    )


@BACKBONE_REGISTRY.register(name="xception71")
def _xception71(norm: NormConfig, name=None):
    from ...config import cfg

    return Xception65(
        output_stride=int(cfg.MODEL.OUTPUT_STRIDE),
        middle_blocks=int(cfg.MODEL.XCEPTION.MIDDLE_BLOCKS),
        variant="71",
        norm=norm,
        name=name,
    )
