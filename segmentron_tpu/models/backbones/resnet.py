"""Dilated ResNet backbones (reference: ``segmentron/models/backbones/resnet.py``).

ResNet-V1 with segmentation-style dilation surgery: ``output_stride=8``
turns the layer3/layer4 strides into dilations (2 then 4);
``output_stride=16`` dilates only layer4. Optional DeepLab multi-grid
in layer4 and a ResNet-C deep stem (three 3x3s replacing the 7x7).

TPU design notes: NHWC layout, static Python structure (everything is
unrolled at trace time — no dynamic control flow), returns the
(c1, c2, c3, c4) feature pyramid exactly like the reference so heads
are interchangeable.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn

from ...modules.basic import ConvBNReLU, conv2d
from ...modules.batch_norm import NormConfig
from .build import BACKBONE_REGISTRY

__all__ = ["ResNet"]


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    previous_dilation: int = 1
    use_downsample: bool = False
    norm: NormConfig = NormConfig()

    expansion = 1

    def _int8_interior(self, train: bool) -> bool:
        """conv2-only int8 hop (``cfg.TPU.INT8_RESNET``), mirroring
        ``Bottleneck._int8_interior``: quantize fuses into bn1's
        folded epilogue, conv2 (50% of block FLOPs) runs s8 x s8, the
        residual chain stays bf16. BasicBlock is what HRNet's branches
        are made of, so this covers config #4 as well as resnet18/34."""
        from ...config import cfg

        if train or self.is_initializing():
            return False
        if not bool(cfg.TPU.INT8_RESNET) or bool(cfg.TPU.INT8_CALIBRATE):
            return False
        if self.previous_dilation >= 8:
            # dilated int8 conv lowering regresses at large rates (see
            # Bottleneck gate / BASELINE.md r4 DANet multi-grid A/B)
            return False
        return self.norm.bn_type in ("BN", "SyncBN", "FrozenBN")

    def _int8_forward(self, x):
        import jax.numpy as jnp

        from ...config import cfg
        from ...modules.basic import _SharedBN, _SharedKernel
        from ...ops.quant import (
            bn_amax, bn_folded_affine, qconv, quantize_static, site_amax,
        )

        k = float(cfg.TPU.INT8_K)
        eps = self.norm.eps
        f = self.features

        y = conv2d(f, 3, self.stride, None, self.dilation, name="conv1")(x)
        a1, c1 = bn_folded_affine(*_SharedBN(name="bn1")(f), eps)
        y = jnp.maximum(y.astype(jnp.float32) * a1 + c1, 0.0)
        q = quantize_static(y, site_amax(self, "bn1", bn_amax(a1, c1, k=k)))

        w2 = _SharedKernel((3, 3, f, f), name="conv2")()
        a2, c2 = bn_folded_affine(*_SharedBN(name="bn2")(f), eps)
        y = qconv(
            q, w2, 1, None, self.previous_dilation,
            bn_affine=(a2, c2), relu=False,
        )

        if self.use_downsample:
            identity = conv2d(
                f, 1, self.stride, 0, name="downsample_conv"
            )(x)
            a_d, c_d = bn_folded_affine(
                *_SharedBN(name="downsample_bn")(f), eps
            )
            identity = identity.astype(jnp.float32) * a_d + c_d
        else:
            identity = x
        return jnp.maximum(y + identity.astype(jnp.float32), 0.0).astype(
            x.dtype
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self._int8_interior(train):
            return self._int8_forward(x)
        from ...ops.quant import observe_amax

        identity = x
        y = conv2d(self.features, 3, self.stride, None, self.dilation, name="conv1")(x)
        y = self.norm.make("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        observe_amax(self, "bn1", y)
        y = conv2d(self.features, 3, 1, None, self.previous_dilation, name="conv2")(y)
        y = self.norm.make("bn2")(y, use_running_average=not train)
        if self.use_downsample:
            identity = conv2d(self.features, 1, self.stride, 0, name="downsample_conv")(
                x
            )
            identity = self.norm.make("downsample_bn")(
                identity, use_running_average=not train
            )
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    previous_dilation: int = 1
    use_downsample: bool = False
    norm: NormConfig = NormConfig()

    expansion = 4

    def _int8_interior(self, train: bool) -> bool:
        """Static-int8 INTERIOR hops (``cfg.TPU.INT8_RESNET``): the
        quantize fuses into conv1's folded-BN epilogue, conv2 (3x3,
        ~53% of block FLOPs) and conv3 run s8 x s8 -> s32 on the MXU,
        and the result dequantizes before the residual add so the skip
        chain stays bf16 — quantization noise never accumulates across
        the 33 blocks of a ResNet-101."""
        from ...config import cfg

        if train or self.is_initializing():
            return False
        if not bool(cfg.TPU.INT8_RESNET) or bool(cfg.TPU.INT8_CALIBRATE):
            return False
        if self.dilation >= 8:
            # XLA's dilated int8 conv lowering is a regression at large
            # rates (same family as the r2 int8-depthwise finding):
            # DANet multi-grid layer4 (d=8/16/32) measured 81.6 ms
            # int8 vs 69.5 bf16 @1024x2048, while plain-dilation OCNet
            # (d<=4) gains 12%. Keep multi-grid blocks bf16.
            return False
        return self.norm.bn_type in ("BN", "SyncBN", "FrozenBN")

    def _int8_forward(self, x):
        import jax.numpy as jnp

        from ...config import cfg
        from ...modules.basic import _SharedBN, _SharedKernel
        from ...ops.quant import (
            bn_amax, bn_folded_affine, qconv, quantize_static, site_amax,
        )

        k = float(cfg.TPU.INT8_K)
        eps = self.norm.eps
        f = self.features

        # conv1 (1x1, bf16) with folded bn1 + relu + quantize epilogue
        y = conv2d(f, 1, 1, 0, name="conv1")(x)
        a1, c1 = bn_folded_affine(*_SharedBN(name="bn1")(f), eps)
        y = jnp.maximum(y.astype(jnp.float32) * a1 + c1, 0.0)
        q = quantize_static(y, site_amax(self, "bn1", bn_amax(a1, c1, k=k)))

        # conv2 (3x3) + conv3 (1x1): s8 x s8 with fused fp32 epilogues
        w2 = _SharedKernel((3, 3, f, f), name="conv2")()
        a2, c2 = bn_folded_affine(*_SharedBN(name="bn2")(f), eps)
        q = qconv(
            q, w2, self.stride, None, self.dilation,
            bn_affine=(a2, c2), relu=True,
            out_amax=site_amax(self, "bn2", bn_amax(a2, c2, k=k)),
        )
        w3 = _SharedKernel((1, 1, f, f * 4), name="conv3")()
        a3, c3 = bn_folded_affine(*_SharedBN(name="bn3")(f * 4), eps)
        y = qconv(q, w3, 1, 0, bn_affine=(a3, c3), relu=False)

        if self.use_downsample:
            identity = conv2d(
                f * 4, 1, self.stride, 0, name="downsample_conv"
            )(x)
            a_d, c_d = bn_folded_affine(
                *_SharedBN(name="downsample_bn")(f * 4), eps
            )
            identity = identity.astype(jnp.float32) * a_d + c_d
        else:
            identity = x
        return jnp.maximum(y + identity.astype(jnp.float32), 0.0).astype(
            x.dtype
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self._int8_interior(train):
            return self._int8_forward(x)
        from ...ops.quant import observe_amax

        identity = x
        y = conv2d(self.features, 1, 1, 0, name="conv1")(x)
        y = self.norm.make("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        observe_amax(self, "bn1", y)
        y = conv2d(self.features, 3, self.stride, None, self.dilation, name="conv2")(y)
        y = self.norm.make("bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        observe_amax(self, "bn2", y)
        y = conv2d(self.features * 4, 1, 1, 0, name="conv3")(y)
        y = self.norm.make("bn3")(y, use_running_average=not train)
        if self.use_downsample:
            identity = conv2d(
                self.features * 4, 1, self.stride, 0, name="downsample_conv"
            )(x)
            identity = self.norm.make("downsample_bn")(
                identity, use_running_average=not train
            )
        return nn.relu(y + identity)


class ResNet(nn.Module):
    block: type = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    output_stride: int = 16
    deep_stem: bool = False
    stem_width: int = 64
    multi_grid: bool = False
    multi_dilation: Optional[Sequence[int]] = None
    norm: NormConfig = NormConfig()

    def _make_layer(
        self, x, idx: int, features: int, blocks: int, stride: int, dilation: int,
        train: bool, multi_dilation: Optional[Sequence[int]] = None,
    ):
        in_ch = x.shape[-1]
        out_ch = features * self.block.expansion
        for b in range(blocks):
            s = stride if b == 0 else 1
            if multi_dilation is not None:
                d = multi_dilation[b % len(multi_dilation)] * max(dilation // 2, 1)
            elif dilation in (1, 2) or b > 0:
                d = dilation
            else:
                # first block of a dilation-4 stage uses rate 2 (reference
                # "previous dilation" convention for OS8 layer4)
                d = dilation // 2
            need_ds = b == 0 and (stride != 1 or in_ch != out_ch)
            x = self.block(
                features,
                stride=s,
                dilation=d,
                previous_dilation=dilation,
                use_downsample=need_ds,
                norm=self.norm,
                name=f"layer{idx}_{b}",
            )(x, train)
            in_ch = out_ch
        return x

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        if self.deep_stem:
            x = ConvBNReLU(self.stem_width, 3, 2, norm=self.norm, name="stem1")(
                x, train
            )
            x = ConvBNReLU(self.stem_width, 3, 1, norm=self.norm, name="stem2")(
                x, train
            )
            x = ConvBNReLU(self.stem_width * 2, 3, 1, norm=self.norm, name="stem3")(
                x, train
            )
        else:
            # 7x7 stem stays on the plain XLA conv: the W-blocked
            # formulation (ops/stem.py) was measured neutral-to-negative
            # at 7 taps (~7x zero-pad FLOP waste vs ~3x at k=3; FCN
            # 507.9 -> 493.0 img/s) and pick_block rejects k>5, so a
            # wblock branch here would be dead code. 3x3 stems (deep
            # stem above, Xception) do route through wblock.
            x = conv2d(64, 7, 2, 3, name="conv1")(x)
            x = self.norm.make("bn1")(x, use_running_average=not train)
            x = nn.relu(x)
        # torch max_pool2d(kernel=3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        if self.output_stride == 8:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        elif self.output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        else:  # 32: classification layout
            strides, dilations = (1, 2, 2, 2), (1, 1, 1, 1)

        c1 = self._make_layer(x, 1, 64, self.layers[0], strides[0], dilations[0], train)
        c2 = self._make_layer(c1, 2, 128, self.layers[1], strides[1], dilations[1], train)
        c3 = self._make_layer(c2, 3, 256, self.layers[2], strides[2], dilations[2], train)
        md = self.multi_dilation if self.multi_grid else None
        c4 = self._make_layer(
            c3, 4, 512, self.layers[3], strides[3], dilations[3], train,
            multi_dilation=md,
        )
        return c1, c2, c3, c4


def _register(name: str, block, layers, **kw):
    @BACKBONE_REGISTRY.register(name=name)
    def _ctor(norm: NormConfig, name=None, _block=block, _layers=layers, _kw=dict(kw)):
        from ...config import cfg

        return ResNet(
            name=name,
            block=_block,
            layers=_layers,
            output_stride=int(cfg.MODEL.OUTPUT_STRIDE),
            multi_grid=bool(cfg.MODEL.DANET.MULTI_GRID),
            multi_dilation=cfg.MODEL.DANET.MULTI_DILATION,
            norm=norm,
            **_kw,
        )


_register("resnet18", BasicBlock, (2, 2, 2, 2))
_register("resnet34", BasicBlock, (3, 4, 6, 3))
_register("resnet50", Bottleneck, (3, 4, 6, 3))
_register("resnet101", Bottleneck, (3, 4, 23, 3))
_register("resnet152", Bottleneck, (3, 8, 36, 3))
_register("resnet50c", Bottleneck, (3, 4, 6, 3), deep_stem=True)
_register("resnet101c", Bottleneck, (3, 4, 23, 3), deep_stem=True)
_register("resnet152c", Bottleneck, (3, 8, 36, 3), deep_stem=True)
