"""FCN (reference: ``segmentron/models/fcn.py``).

Backbone c4 -> FCNHead -> bilinear upsample to input size; optional aux
FCNHead on c3.
"""

from __future__ import annotations

import flax.linen as nn

from ..modules import FCNHead
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["FCN"]


class FCN(SegBaseModel):
    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        c1, c2, c3, c4 = self.base_forward(x, train)
        out = FCNHead(self.nclass, norm=self.decoder_norm, name="head")(c4, train)
        outputs = [resize_bilinear(out, size, align_corners=True)]
        if self.aux:
            auxout = FCNHead(self.nclass, norm=self.decoder_norm, name="auxlayer")(
                c3, train
            )
            outputs.append(resize_bilinear(auxout, size, align_corners=True))
        return tuple(outputs)


@MODEL_REGISTRY.register(name="FCN")
def _fcn(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return FCN(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower(),
        aux=bool(cfg.SOLVER.AUX),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
