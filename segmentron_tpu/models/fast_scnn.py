"""Fast-SCNN (reference: ``segmentron/models/fast_scnn.py`` — the
SegmenTron authors' own real-time model).

Learning-to-downsample (conv + 2 separable convs, /8) -> global feature
extractor (inverted residuals + PPM) -> feature fusion -> classifier.
No ImageNet backbone — trains from scratch.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..modules import (
    ConvBNReLU,
    Dropout2d,
    FCNHead,
    InvertedResidual,
    PyramidPooling,
    SeparableConv2d,
)
from ..modules.basic import conv2d
from ..modules.batch_norm import NormConfig
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["FastSCNN"]


class FastSCNN(SegBaseModel):
    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm

        # learning to downsample (/8)
        y = ConvBNReLU(32, 3, 2, norm=norm, name="conv")(x, train)
        y = SeparableConv2d(48, 3, 2, norm=norm, relu_first=False, name="dsconv1")(
            y, train
        )
        y = nn.relu(y)
        y = SeparableConv2d(64, 3, 2, norm=norm, relu_first=False, name="dsconv2")(
            y, train
        )
        higher = nn.relu(y)

        # global feature extractor (/32)
        z = higher
        for i, (c, n_blocks, s) in enumerate(((64, 3, 2), (96, 3, 2), (128, 3, 1))):
            for b in range(n_blocks):
                z = InvertedResidual(
                    c, stride=s if b == 0 else 1, expand_ratio=6, norm=norm,
                    name=f"bottleneck{i}_{b}",
                )(z, train)
        z = PyramidPooling(out_channels=32, norm=norm, name="ppm")(z, train)
        z = ConvBNReLU(128, 1, padding=0, norm=norm, name="ppm_out")(z, train)

        # feature fusion
        lower = resize_bilinear(z, higher.shape[1:3], align_corners=True)
        lower = ConvBNReLU(
            128, 3, dilation=1, groups=128, norm=norm, act=None, name="ffm_dwconv"
        )(lower, train)
        lower = conv2d(128, 1, 1, 0, use_bias=True, name="ffm_lower_proj")(lower)
        hi = conv2d(128, 1, 1, 0, use_bias=True, name="ffm_higher_proj")(higher)
        hi = norm.make("ffm_higher_bn")(hi, use_running_average=not train)
        fused = nn.relu(lower + hi)

        # classifier
        out = SeparableConv2d(128, 3, norm=norm, relu_first=False, name="cls_ds1")(
            fused, train
        )
        out = nn.relu(out)
        out = SeparableConv2d(128, 3, norm=norm, relu_first=False, name="cls_ds2")(
            out, train
        )
        out = nn.relu(out)
        out = Dropout2d(0.1)(out, train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(out)
        outputs = [resize_bilinear(out, size, align_corners=True)]
        if self.aux:
            auxout = FCNHead(self.nclass, norm=norm, name="auxlayer")(higher, train)
            outputs.append(resize_bilinear(auxout, size, align_corners=True))
        return tuple(outputs)


@MODEL_REGISTRY.register(name="FastSCNN")
def _fast_scnn(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return FastSCNN(
        nclass=nclass,
        backbone="",  # no backbone
        aux=bool(cfg.SOLVER.AUX),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
