"""ESPNetV2 segmentation (reference: ``segmentron/models/espnet.py``).

EESPNet encoder + light pyramid decoder: PSP-style context on c4, then
two upsample-concat-EESP fusion steps against c3 and c2, ending in a
1x1 classifier at /4 and a bilinear x4 to input resolution.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ConvBNReLU, Dropout2d, PyramidPooling
from ..modules.basic import conv2d
from ..ops import resize_bilinear
from .backbones.eespnet import _EESP
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["ESPNetV2"]


class ESPNetV2(SegBaseModel):
    proj_ch: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm
        _, c2, c3, c4 = self.base_forward(x, train)

        y = PyramidPooling(out_channels=self.proj_ch // 4, norm=norm, name="psp")(
            c4, train
        )
        y = ConvBNReLU(self.proj_ch, 1, padding=0, norm=norm, name="proj4")(y, train)

        y = resize_bilinear(y, c3.shape[1:3], align_corners=True)
        l3 = ConvBNReLU(self.proj_ch, 1, padding=0, norm=norm, name="proj3")(c3, train)
        y = _EESP(self.proj_ch, norm=norm, name="fuse3")(
            jnp.concatenate([y, l3], axis=-1), train
        )

        y = resize_bilinear(y, c2.shape[1:3], align_corners=True)
        l2 = ConvBNReLU(self.proj_ch, 1, padding=0, norm=norm, name="proj2")(c2, train)
        y = _EESP(self.proj_ch, norm=norm, name="fuse2")(
            jnp.concatenate([y, l2], axis=-1), train
        )

        y = Dropout2d(0.1)(y, train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
        return (resize_bilinear(out, size, align_corners=True),)


@MODEL_REGISTRY.register(name="ESPNetV2")
def _espnetv2(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return ESPNetV2(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower() or "eespnet",
        aux=False,
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
