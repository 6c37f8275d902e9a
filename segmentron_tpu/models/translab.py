"""TransLab (reference: SegmenTron authors' Trans10K model — SURVEY.md
§2.6 lists it [L] as living on a non-master branch; rebuilt here from
the paper "Segmenting Transparent Objects in the Wild", Xie et al.
2020).

Two coupled streams over a shared dilated backbone: a *boundary* stream
predicts transparent-object boundaries (supervised with a dice+BCE loss
against boundaries derived from the mask), and a boundary attention
module (BAM) gates the segmentation decoder's features with the
predicted boundary map at every scale.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ASPP, ConvBNReLU
from ..modules.basic import conv2d
from ..modules.batch_norm import NormConfig
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["TransLab"]


class _BAM(nn.Module):
    """Boundary Attention Module: features re-weighted by the predicted
    boundary probability plus a residual refinement conv."""

    features: int
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, boundary_logits, train: bool = False):
        b = nn.sigmoid(
            resize_bilinear(boundary_logits, x.shape[1:3], align_corners=True)
        )
        y = x * b + x
        return ConvBNReLU(self.features, 3, norm=self.norm, name="refine")(
            y, train
        )


class TransLab(SegBaseModel):
    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm
        c1, c2, c3, c4 = self.base_forward(x, train)

        # ---- boundary stream: fuse shallow + deep cues -> 1ch logits
        b1 = ConvBNReLU(48, 1, padding=0, norm=norm, name="b_c1")(c1, train)
        b4 = ConvBNReLU(48, 1, padding=0, norm=norm, name="b_c4")(c4, train)
        b4 = resize_bilinear(b4, c1.shape[1:3], align_corners=True)
        bf = ConvBNReLU(48, 3, norm=norm, name="b_fuse")(
            jnp.concatenate([b1, b4], axis=-1), train
        )
        boundary = conv2d(1, 1, 1, 0, use_bias=True, name="b_classifier")(bf)

        # ---- segmentation stream: ASPP + boundary-gated decoder
        y = ASPP(256, norm=norm, name="head")(c4, train)
        y = _BAM(256, norm=norm, name="bam_high")(y, boundary, train)
        y = resize_bilinear(y, c1.shape[1:3], align_corners=True)
        low = ConvBNReLU(48, 1, padding=0, norm=norm, name="c1_proj")(c1, train)
        y = jnp.concatenate([y, low], axis=-1)
        y = ConvBNReLU(256, 3, norm=norm, name="dec_conv1")(y, train)
        y = _BAM(256, norm=norm, name="bam_low")(y, boundary, train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)

        return (
            resize_bilinear(out, size, align_corners=True),
            resize_bilinear(boundary, size, align_corners=True),
        )


@MODEL_REGISTRY.register(name="TransLab")
def _translab(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return TransLab(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower() or "resnet50",
        aux=False,
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
