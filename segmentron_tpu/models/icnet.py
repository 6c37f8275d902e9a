"""ICNet (reference: ``segmentron/models/icnet.py``).

Image cascade network: a cheap full-resolution branch (three stride-2
convs), a 1/2-resolution branch through the backbone's early stages and
a 1/4-resolution branch through its late stages + pyramid pooling,
merged by cascade-feature-fusion (CFF) units. Branch weights are shared
by calling the same backbone module on both scaled inputs (linen reuses
params on the second call). Trains with ``ICNetLoss`` (cascade label
guidance at each fusion point).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ConvBNReLU, PyramidPooling
from ..modules.basic import conv2d
from ..modules.batch_norm import NormConfig
from ..ops import resize_bilinear
from .backbones import get_segmentation_backbone
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["ICNet"]


class _CFF(nn.Module):
    """Cascade feature fusion: dilated conv on the upsampled low branch +
    projected high branch, summed; aux classifier tap on the low branch."""

    features: int
    nclass: int
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, low, high, train: bool = False):
        low = resize_bilinear(low, high.shape[1:3], align_corners=True)
        aux = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="aux_cls")(low)
        low = conv2d(self.features, 3, 1, None, dilation=2, name="low_conv")(low)
        low = self.norm.make("low_bn")(low, use_running_average=not train)
        high = conv2d(self.features, 1, 1, 0, name="high_conv")(high)
        high = self.norm.make("high_bn")(high, use_running_average=not train)
        return nn.relu(low + high), aux


class ICNet(SegBaseModel):
    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm
        h, w = size

        # full-res branch (/8)
        sub1 = x
        for i, ch in enumerate((32, 32, 64)):
            sub1 = ConvBNReLU(ch, 3, 2, norm=norm, name=f"sub1_conv{i + 1}")(
                sub1, train
            )

        # shared backbone on 1/2 and 1/4 inputs (same module => shared params)
        bb = get_segmentation_backbone(self.backbone, self.encoder_norm,
                                       name="backbone")
        x_half = resize_bilinear(x, (h // 2, w // 2), align_corners=True)
        _, sub2, _, _ = bb(x_half, train)
        x_quarter = resize_bilinear(x, (h // 4, w // 4), align_corners=True)
        _, _, _, c4_q = bb(x_quarter, train)
        sub4 = PyramidPooling(norm=norm, name="ppm")(c4_q, train)
        sub4 = ConvBNReLU(256, 1, padding=0, norm=norm, name="ppm_proj")(sub4, train)

        fused24, aux4 = _CFF(128, self.nclass, norm=norm, name="cff24")(
            sub4, ConvBNReLU(256, 1, padding=0, norm=norm, name="sub2_proj")(
                sub2, train
            ), train,
        )
        fused12, aux2 = _CFF(128, self.nclass, norm=norm, name="cff12")(
            fused24, sub1, train
        )
        up = resize_bilinear(
            fused12, (fused12.shape[1] * 2, fused12.shape[2] * 2), align_corners=True
        )
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(up)
        out = resize_bilinear(out, size, align_corners=True)
        # cascade outputs: (final, /8 guidance, /16 guidance) for ICNetLoss
        return (out, aux2, aux4)


@MODEL_REGISTRY.register(name="ICNet")
def _icnet(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return ICNet(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower() or "resnet50",
        aux=False,
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
