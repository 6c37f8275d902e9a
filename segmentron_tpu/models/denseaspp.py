"""DenseASPP (reference: ``segmentron/models/denseaspp.py``).

Densely-connected atrous convolutions on c4: each dilated layer
consumes the concat of the input and all previous layers' outputs
(rates 3, 6, 12, 18, 24).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ConvBNReLU, Dropout2d, FCNHead
from ..modules.basic import conv2d
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["DenseASPP"]


class DenseASPP(SegBaseModel):
    rates: Sequence[int] = (3, 6, 12, 18, 24)
    inter1: int = 512
    inter2: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm
        c1, c2, c3, c4 = self.base_forward(x, train)

        feats = [c4]
        for i, rate in enumerate(self.rates):
            y = jnp.concatenate(feats, axis=-1)
            y = ConvBNReLU(self.inter1, 1, padding=0, norm=norm, name=f"aspp{i}_1x1")(
                y, train
            )
            y = Dropout2d(0.1)(y, train)
            y = conv2d(
                self.inter2, 3, 1, None, dilation=rate, use_bias=True,
                name=f"aspp{i}_3x3",
            )(y)
            feats.append(y)
        y = jnp.concatenate(feats, axis=-1)
        y = Dropout2d(0.1)(y, train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
        outputs = [resize_bilinear(out, size, align_corners=True)]
        if self.aux:
            auxout = FCNHead(self.nclass, norm=norm, name="auxlayer")(c3, train)
            outputs.append(resize_bilinear(auxout, size, align_corners=True))
        return tuple(outputs)


@MODEL_REGISTRY.register(name="DenseASPP")
def _denseaspp(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return DenseASPP(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower() or "resnet101",
        aux=bool(cfg.SOLVER.AUX),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
