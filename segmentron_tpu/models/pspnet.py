"""PSPNet (reference: ``segmentron/models/pspnet.py``).

c4 -> PyramidPooling -> 3x3 ConvBNReLU + dropout -> 1x1 classifier ->
upsample; aux FCNHead on c3.
"""

from __future__ import annotations

import flax.linen as nn

from ..modules import ConvBNReLU, Dropout2d, FCNHead, PyramidPooling
from ..modules.basic import conv2d
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["PSPNet"]


class _PSPHead(nn.Module):
    nclass: int
    norm: "NormConfig" = None  # type: ignore[name-defined]

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = PyramidPooling(norm=self.norm, name="psp")(x, train)
        x = ConvBNReLU(512, 3, norm=self.norm, name="block")(x, train)
        x = Dropout2d(0.1)(x, train)
        x = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(x)
        return x


class PSPNet(SegBaseModel):
    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        c1, c2, c3, c4 = self.base_forward(x, train)
        out = _PSPHead(self.nclass, norm=self.decoder_norm, name="head")(c4, train)
        outputs = [resize_bilinear(out, size, align_corners=True)]
        if self.aux:
            auxout = FCNHead(self.nclass, norm=self.decoder_norm, name="auxlayer")(
                c3, train
            )
            outputs.append(resize_bilinear(auxout, size, align_corners=True))
        return tuple(outputs)


@MODEL_REGISTRY.register(name="PSPNet")
def _pspnet(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return PSPNet(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower(),
        aux=bool(cfg.SOLVER.AUX),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
