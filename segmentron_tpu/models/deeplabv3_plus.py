"""DeepLabv3+ (reference: ``segmentron/models/deeplabv3_plus.py``).

c4 -> ASPP -> x4 up -> concat with 1x1-projected c1 (48ch low level) ->
two (separable) 3x3 ConvBNReLU -> 1x1 classifier -> x4 up. Config
toggles mirror the reference: USE_ASPP, ENABLE_DECODER,
ASPP_WITH_SEP_CONV, DECODER_USE_SEP_CONV. Atrous rates follow the
output stride: {12,24,36} at OS8, {6,12,18} at OS16.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ASPP, ConvBNReLU, FCNHead, SeparableConv2d
from ..modules.basic import conv2d
from ..modules.batch_norm import NormConfig
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["DeepLabV3Plus"]


class DeepLabV3Plus(SegBaseModel):
    use_aspp: bool = True
    enable_decoder: bool = True
    aspp_sep: bool = True
    decoder_sep: bool = True
    output_stride: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        c1, c2, c3, c4 = self.base_forward(x, train)

        rates = (12, 24, 36) if self.output_stride == 8 else (6, 12, 18)
        if self.use_aspp:
            y = ASPP(
                out_channels=256,
                atrous_rates=rates,
                separable=self.aspp_sep,
                norm=self.decoder_norm,
                name="head",
            )(c4, train)
        else:
            y = ConvBNReLU(256, 3, norm=self.decoder_norm, name="head")(c4, train)

        if self.enable_decoder:
            low = ConvBNReLU(48, 1, padding=0, norm=self.decoder_norm, name="c1_proj")(
                c1, train
            )
            y = resize_bilinear(y, low.shape[1:3], align_corners=True)
            y = jnp.concatenate([y, low], axis=-1)
            for i in range(2):
                if self.decoder_sep:
                    y = SeparableConv2d(
                        256, 3, norm=self.decoder_norm, relu_first=False,
                        name=f"decoder{i}",
                    )(y, train)
                    y = nn.relu(y)
                else:
                    y = ConvBNReLU(
                        256, 3, norm=self.decoder_norm, name=f"decoder{i}"
                    )(y, train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
        outputs = [resize_bilinear(out, size, align_corners=True)]
        if self.aux:
            auxout = FCNHead(self.nclass, norm=self.decoder_norm, name="auxlayer")(
                c3, train
            )
            outputs.append(resize_bilinear(auxout, size, align_corners=True))
        return tuple(outputs)


@MODEL_REGISTRY.register(name="DeepLabV3_Plus")
def _deeplabv3_plus(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    d = cfg.MODEL.DEEPLABV3_PLUS
    return DeepLabV3Plus(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower(),
        aux=bool(cfg.SOLVER.AUX),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
        use_aspp=bool(d.USE_ASPP),
        enable_decoder=bool(d.ENABLE_DECODER),
        aspp_sep=bool(d.ASPP_WITH_SEP_CONV),
        decoder_sep=bool(d.DECODER_USE_SEP_CONV),
        output_stride=int(cfg.MODEL.OUTPUT_STRIDE),
    )
