"""OCNet — object context network (reference: ``segmentron/models/ocnet.py``).

Self-attention object context on c4 with three head variants selected
by ``cfg.MODEL.OCNet.OC_ARCH``:

- ``base``:    one self-attention block, concat with input, project.
- ``pyramid``: attention computed inside {1,2,3,6} spatial partitions
  (each cell attends within itself), concatenated pyramid-style.
- ``asp``:     ASPP whose 1x1-branch is replaced by the OC block
  (ASP-OC).

The attention itself is the shared ``spatial_attention`` op (scaled,
key_channels**-0.5) with the Pallas flash path for large HW.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ConvBNReLU, Dropout2d, FCNHead
from ..modules.basic import conv2d
from ..modules.batch_norm import NormConfig
from ..ops import resize_bilinear
from ..ops.attention import spatial_attention
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["OCNet"]


class SelfAttentionBlock(nn.Module):
    key_channels: int
    value_channels: int
    out_channels: int
    norm: NormConfig = NormConfig()
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        q = ConvBNReLU(self.key_channels, 1, padding=0, norm=self.norm, name="f_query")(
            x, train
        )
        k = ConvBNReLU(self.key_channels, 1, padding=0, norm=self.norm, name="f_key")(
            x, train
        )
        v = conv2d(self.value_channels, 1, 1, 0, use_bias=True, name="f_value")(x)
        ctx = spatial_attention(
            q.reshape(n, h * w, self.key_channels),
            k.reshape(n, h * w, self.key_channels),
            v.reshape(n, h * w, self.value_channels),
            scale=self.key_channels**-0.5,
            use_pallas=self.use_pallas,
        ).reshape(n, h, w, self.value_channels)
        return conv2d(self.out_channels, 1, 1, 0, use_bias=True, name="w_out")(ctx)


class BaseOCModule(nn.Module):
    out_channels: int
    norm: NormConfig = NormConfig()
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ctx = SelfAttentionBlock(
            key_channels=self.out_channels // 2,
            value_channels=self.out_channels,
            out_channels=self.out_channels,
            norm=self.norm,
            use_pallas=self.use_pallas,
            name="attn",
        )(x, train)
        y = jnp.concatenate([ctx, x], axis=-1)
        y = ConvBNReLU(self.out_channels, 1, padding=0, norm=self.norm, name="proj")(
            y, train
        )
        return Dropout2d(0.05)(y, train)


class PyramidOCModule(nn.Module):
    out_channels: int
    levels: Sequence[int] = (1, 2, 3, 6)
    norm: NormConfig = NormConfig()
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        outs = []
        for li, level in enumerate(self.levels):
            # partition into level x level cells; attention within cells.
            ph = -(-h // level) * level
            pw = -(-w // level) * level
            xp = jnp.pad(x, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
            bh, bw = ph // level, pw // level
            cells = xp.reshape(n, level, bh, level, bw, c).transpose(0, 1, 3, 2, 4, 5)
            cells = cells.reshape(n * level * level, bh, bw, c)
            ctx = SelfAttentionBlock(
                key_channels=self.out_channels // 2,
                value_channels=self.out_channels,
                out_channels=self.out_channels,
                norm=self.norm,
                use_pallas=self.use_pallas,
                name=f"attn{li}",
            )(cells, train)
            ctx = ctx.reshape(n, level, level, bh, bw, self.out_channels)
            ctx = ctx.transpose(0, 1, 3, 2, 4, 5).reshape(
                n, ph, pw, self.out_channels
            )[:, :h, :w]
            outs.append(ctx)
        y = jnp.concatenate(outs + [x], axis=-1)
        y = ConvBNReLU(
            self.out_channels * 2, 1, padding=0, norm=self.norm, name="proj"
        )(y, train)
        return Dropout2d(0.05)(y, train)


class ASPOCModule(nn.Module):
    out_channels: int
    atrous_rates: Sequence[int] = (12, 24, 36)
    norm: NormConfig = NormConfig()
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ctx = ConvBNReLU(self.out_channels, 3, norm=self.norm, name="oc_conv")(x, train)
        ctx = BaseOCModule(
            self.out_channels, norm=self.norm, use_pallas=self.use_pallas, name="oc"
        )(ctx, train)
        branches = [ctx]
        branches.append(
            ConvBNReLU(self.out_channels, 1, padding=0, norm=self.norm, name="b1")(
                x, train
            )
        )
        for i, rate in enumerate(self.atrous_rates):
            branches.append(
                ConvBNReLU(
                    self.out_channels, 3, dilation=rate, norm=self.norm,
                    name=f"b{i + 2}",
                )(x, train)
            )
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU(self.out_channels * 2, 1, padding=0, norm=self.norm, name="proj")(
            y, train
        )
        return Dropout2d(0.1)(y, train)


class OCNet(SegBaseModel):
    oc_arch: str = "base"
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        c1, c2, c3, c4 = self.base_forward(x, train)
        y = ConvBNReLU(512, 3, norm=self.decoder_norm, name="reduce")(c4, train)
        if self.oc_arch == "base":
            y = BaseOCModule(
                512, norm=self.decoder_norm, use_pallas=self.use_pallas, name="oc"
            )(y, train)
        elif self.oc_arch == "pyramid":
            y = PyramidOCModule(
                512, norm=self.decoder_norm, use_pallas=self.use_pallas, name="oc"
            )(y, train)
        elif self.oc_arch == "asp":
            y = ASPOCModule(
                512, norm=self.decoder_norm, use_pallas=self.use_pallas, name="oc"
            )(y, train)
        else:
            raise ValueError(f"Unknown OC_ARCH: {self.oc_arch}")
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
        outputs = [resize_bilinear(out, size, align_corners=True)]
        if self.aux:
            auxout = FCNHead(self.nclass, norm=self.decoder_norm, name="auxlayer")(
                c3, train
            )
            outputs.append(resize_bilinear(auxout, size, align_corners=True))
        return tuple(outputs)


@MODEL_REGISTRY.register(name="OCNet")
def _ocnet(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return OCNet(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower(),
        aux=bool(cfg.SOLVER.AUX),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
        oc_arch=str(cfg.MODEL.OCNet.OC_ARCH),
        use_pallas=bool(cfg.TPU.USE_PALLAS),
    )
