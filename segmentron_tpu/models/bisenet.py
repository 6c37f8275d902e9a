"""BiSeNet (reference: ``segmentron/models/bisenet.py``).

Spatial path: three stride-2 ConvBNReLUs keeping detail at /8.
Context path: backbone c3/c4 with global pooling tail + attention
refinement modules (ARM), fused by the feature fusion module (FFM).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ConvBNReLU, FCNHead
from ..modules.basic import conv2d
from ..ops import global_avg_pool, resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["BiSeNet"]


class _ARM(nn.Module):
    """Attention refinement: global-pool -> 1x1 conv+BN+sigmoid gate."""

    features: int
    norm: "NormConfig" = None  # type: ignore[name-defined]

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.features, 3, norm=self.norm, name="conv")(x, train)
        g = global_avg_pool(x)
        g = conv2d(self.features, 1, 1, 0, name="gate_conv")(g)
        g = self.norm.make("gate_bn")(g, use_running_average=not train)
        return x * nn.sigmoid(g)


class _FFM(nn.Module):
    features: int
    norm: "NormConfig" = None  # type: ignore[name-defined]

    @nn.compact
    def __call__(self, spatial, context, train: bool = False):
        x = jnp.concatenate([spatial, context], axis=-1)
        x = ConvBNReLU(self.features, 1, padding=0, norm=self.norm, name="fuse")(
            x, train
        )
        g = global_avg_pool(x)
        g = nn.relu(conv2d(self.features // 4, 1, 1, 0, use_bias=True, name="se1")(g))
        g = nn.sigmoid(conv2d(self.features, 1, 1, 0, use_bias=True, name="se2")(g))
        return x + x * g


class BiSeNet(SegBaseModel):
    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm

        # spatial path (/8)
        sp = ConvBNReLU(64, 7, 2, norm=norm, name="sp1")(x, train)
        sp = ConvBNReLU(64, 3, 2, norm=norm, name="sp2")(sp, train)
        sp = ConvBNReLU(64, 3, 2, norm=norm, name="sp3")(sp, train)
        sp = ConvBNReLU(128, 1, padding=0, norm=norm, name="sp4")(sp, train)

        # context path
        c1, c2, c3, c4 = self.base_forward(x, train)
        tail = global_avg_pool(c4)
        arm4 = _ARM(128, norm=norm, name="arm4")(c4, train)
        arm4 = arm4 + conv2d(128, 1, 1, 0, use_bias=True, name="tail_proj")(
            jnp.broadcast_to(tail, c4.shape[:3] + (tail.shape[-1],))
        )
        arm4 = resize_bilinear(arm4, c3.shape[1:3], align_corners=True)
        arm4 = ConvBNReLU(128, 3, norm=norm, name="refine4")(arm4, train)
        arm3 = _ARM(128, norm=norm, name="arm3")(c3, train)
        ctx = arm3 + arm4
        ctx = resize_bilinear(ctx, sp.shape[1:3], align_corners=True)
        ctx = ConvBNReLU(128, 3, norm=norm, name="refine3")(ctx, train)

        fused = _FFM(256, norm=norm, name="ffm")(sp, ctx, train)
        out = FCNHead(self.nclass, channels=64, norm=norm, name="head")(fused, train)
        outputs = [resize_bilinear(out, size, align_corners=True)]
        if self.aux:
            aux1 = FCNHead(self.nclass, channels=64, norm=norm, name="aux3")(ctx, train)
            outputs.append(resize_bilinear(aux1, size, align_corners=True))
            aux2 = FCNHead(self.nclass, channels=64, norm=norm, name="aux4")(arm4, train)
            outputs.append(resize_bilinear(aux2, size, align_corners=True))
        return tuple(outputs)


@MODEL_REGISTRY.register(name="BiSeNet")
def _bisenet(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return BiSeNet(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower() or "resnet18",
        aux=bool(cfg.SOLVER.AUX),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
