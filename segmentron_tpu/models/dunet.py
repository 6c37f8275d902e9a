"""DUNet (reference: ``segmentron/models/dunet.py``).

"Decoders Matter for Semantic Segmentation": fuse c2/c3 into c4, run a
small conv head, then **DUpsampling** — a learned 1x1 projection to
``nclass * s^2`` channels followed by depth-to-space — instead of
bilinear upsampling. The projection + reshape is exactly an MXU matmul
plus a free layout change on TPU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ConvBNReLU, FCNHead
from ..modules.basic import conv2d
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["DUNet", "DUpsampling"]


class DUpsampling(nn.Module):
    """1x1 conv to nclass*scale^2 then depth-to-space by ``scale``."""

    nclass: int
    scale: int

    @nn.compact
    def __call__(self, x):
        s, c = self.scale, self.nclass
        y = conv2d(c * s * s, 1, 1, 0, use_bias=True, name="conv_w")(x)
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, s, s, c)
        y = y.transpose(0, 1, 3, 2, 4, 5)  # (b, h, s, w, s, c)
        return y.reshape(b, h * s, w * s, c)


class DUNet(SegBaseModel):
    output_stride: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.decoder_norm
        _, c2, c3, c4 = self.base_forward(x, train)

        # feature fusion: project c2/c3 to 48ch, resize to c4, concat
        f2 = ConvBNReLU(48, 1, padding=0, norm=norm, name="fuse_c2")(c2, train)
        f3 = ConvBNReLU(48, 1, padding=0, norm=norm, name="fuse_c3")(c3, train)
        f2 = resize_bilinear(f2, c4.shape[1:3], align_corners=True)
        f3 = resize_bilinear(f3, c4.shape[1:3], align_corners=True)
        y = jnp.concatenate([c4, f3, f2], axis=-1)

        y = ConvBNReLU(256, 3, norm=norm, name="head_conv1")(y, train)
        y = ConvBNReLU(256, 3, norm=norm, name="head_conv2")(y, train)
        out = DUpsampling(self.nclass, self.output_stride, name="dupsample")(y)
        outputs = [out]
        if self.aux:
            auxout = FCNHead(self.nclass, norm=norm, name="auxlayer")(c3, train)
            outputs.append(
                resize_bilinear(auxout, out.shape[1:3], align_corners=True)
            )
        return tuple(outputs)


@MODEL_REGISTRY.register(name="DUNet")
def _dunet(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return DUNet(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower() or "resnet50",
        aux=bool(cfg.SOLVER.AUX),
        output_stride=int(cfg.MODEL.OUTPUT_STRIDE),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
