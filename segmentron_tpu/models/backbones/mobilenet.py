"""Dilated MobileNetV2 backbone
(reference: ``segmentron/models/backbones/mobilenet.py``).

Inverted-residual stack with the segmentation dilation trick: stages
past the target output stride trade stride for dilation. Width
multiplier comes from ``cfg.MODEL.BACKBONE_SCALE``. Feature taps follow
the reference: c1 (24ch, /4), c2 (32ch, /8), c3 (96ch, /16-equivalent),
c4 (320ch, final).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn

from ...modules.basic import ConvBNReLU, InvertedResidual
from ...modules.batch_norm import NormConfig
from .build import BACKBONE_REGISTRY

__all__ = ["MobileNetV2"]

# (expand_ratio t, channels c, repeats n, stride s)
_SETTINGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class MobileNetV2(nn.Module):
    width_mult: float = 1.0
    output_stride: int = 16
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        in_ch = _make_divisible(32 * self.width_mult)
        x = ConvBNReLU(in_ch, 3, 2, norm=self.norm, act=nn.relu6, name="stem")(
            x, train
        )
        current_stride = 2
        dilation = 1
        taps = {}
        for si, (t, c, n, s) in enumerate(_SETTINGS):
            out_ch = _make_divisible(c * self.width_mult)
            for bi in range(n):
                stride = s if bi == 0 else 1
                if stride == 2 and current_stride >= self.output_stride:
                    # convert stride to dilation past the target OS
                    stride = 1
                    dilation *= 2
                    block_dilation = max(dilation // 2, 1)
                else:
                    block_dilation = dilation
                if stride == 2:
                    current_stride *= 2
                x = InvertedResidual(
                    out_ch,
                    stride=stride,
                    expand_ratio=t,
                    dilation=block_dilation,
                    norm=self.norm,
                    name=f"block{si}_{bi}",
                )(x, train)
            taps[si] = x
        # c1=/4 (24ch), c2=/8 (32ch), c3=96ch stage, c4=320ch final
        return taps[1], taps[2], taps[4], taps[6]


@BACKBONE_REGISTRY.register(name="mobilenet_v2")
def _mobilenet_v2(norm: NormConfig, name=None):
    from ...config import cfg

    return MobileNetV2(
        name=name,
        width_mult=float(cfg.MODEL.BACKBONE_SCALE),
        output_stride=int(cfg.MODEL.OUTPUT_STRIDE),
        norm=norm,
    )
