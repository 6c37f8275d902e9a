"""U-Net (reference: ``segmentron/models/unet.py``): classic symmetric
encoder-decoder with skip concatenation. No pretrained backbone.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ConvBNReLU
from ..modules.basic import conv2d
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["UNet"]


class _DoubleConv(nn.Module):
    features: int
    norm: "NormConfig" = None  # type: ignore[name-defined]

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.features, 3, norm=self.norm, name="conv1")(x, train)
        x = ConvBNReLU(self.features, 3, norm=self.norm, name="conv2")(x, train)
        return x


class UNet(SegBaseModel):
    base_channels: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.decoder_norm
        c = self.base_channels
        skips = []
        y = x
        for i, ch in enumerate((c, c * 2, c * 4, c * 8)):
            y = _DoubleConv(ch, norm=norm, name=f"down{i}")(y, train)
            skips.append(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = _DoubleConv(c * 16, norm=norm, name="bottom")(y, train)
        for i, (ch, skip) in enumerate(zip((c * 8, c * 4, c * 2, c), skips[::-1])):
            y = resize_bilinear(y, skip.shape[1:3], align_corners=True)
            y = conv2d(ch, 1, 1, 0, use_bias=True, name=f"up{i}_proj")(y)
            y = jnp.concatenate([skip, y], axis=-1)
            y = _DoubleConv(ch, norm=norm, name=f"up{i}")(y, train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
        return (out,)


@MODEL_REGISTRY.register(name="UNet")
def _unet(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return UNet(
        nclass=nclass,
        backbone="",
        aux=False,
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
