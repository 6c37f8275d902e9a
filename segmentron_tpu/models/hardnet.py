"""FC-HarDNet-70 (reference: ``segmentron/models/hardnet.py``).

Harmonic DenseNet: inside a HarDBlock, layer k reads from layers
k - 2^i (its "harmonic" links), so most activations die young and HBM
traffic stays low — the design goal (low memory traffic) matches TPU
economics directly. Encoder = stem + 5 HarDBlocks with stride-2 pools;
decoder = upsample + skip-concat + 1x1 + HarDBlock, U-style.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ConvBNReLU, Dropout2d
from ..modules.basic import conv2d
from ..modules.batch_norm import NormConfig
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["HardNet"]


def _get_link(layer: int, base_ch: int, gr: int, grmul: float):
    """Harmonic link pattern + output channels for one layer."""
    if layer == 0:
        return base_ch, []
    out_ch = float(gr)
    link = []
    for i in range(10):
        dv = 2**i
        if layer % dv == 0:
            link.append(layer - dv)
            if i > 0:
                out_ch *= grmul
    out_ch = int(int(out_ch + 1) / 2) * 2
    return out_ch, link


class _HarDBlock(nn.Module):
    growth_rate: int
    grmul: float
    n_layers: int
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        base_ch = x.shape[-1]
        layers: List = [x]
        for i in range(1, self.n_layers + 1):
            out_ch, link = _get_link(i, base_ch, self.growth_rate, self.grmul)
            tin = jnp.concatenate([layers[j] for j in link], axis=-1)
            y = ConvBNReLU(out_ch, 3, norm=self.norm, name=f"layer{i}")(tin, train)
            layers.append(y)
        # block output: odd-indexed layers + the last one
        outs = [
            layers[i]
            for i in range(len(layers))
            if i == len(layers) - 1 or i % 2 == 1
        ]
        return jnp.concatenate(outs, axis=-1)


class HardNet(SegBaseModel):
    """FC-HarDNet-70 segmentation network (no ImageNet backbone)."""

    first_ch: Sequence[int] = (16, 24, 32, 48)
    ch_list: Sequence[int] = (64, 96, 160, 224, 320)
    grmul: float = 1.7
    gr: Sequence[int] = (10, 16, 18, 24, 32)
    n_layers: Sequence[int] = (4, 4, 8, 8, 8)

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm

        y = ConvBNReLU(self.first_ch[0], 3, 2, norm=norm, name="stem0")(x, train)
        y = ConvBNReLU(self.first_ch[1], 3, norm=norm, name="stem1")(y, train)
        y = ConvBNReLU(self.first_ch[2], 3, 2, norm=norm, name="stem2")(y, train)
        y = ConvBNReLU(self.first_ch[3], 3, norm=norm, name="stem3")(y, train)

        skips = []
        n_blocks = len(self.n_layers)
        for i in range(n_blocks):
            y = _HarDBlock(
                self.gr[i], self.grmul, self.n_layers[i], norm=norm,
                name=f"block{i}",
            )(y, train)
            skips.append(y)
            y = ConvBNReLU(
                self.ch_list[i], 1, padding=0, norm=norm, name=f"trans{i}"
            )(y, train)
            if i < n_blocks - 1:
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))

        # decoder: U-style upsample + skip concat + 1x1 + HarDBlock
        for i in range(n_blocks - 2, -1, -1):
            y = resize_bilinear(y, skips[i].shape[1:3], align_corners=True)
            y = jnp.concatenate([y, skips[i]], axis=-1)
            y = ConvBNReLU(
                self.ch_list[i], 1, padding=0, norm=norm, name=f"dec_conv{i}"
            )(y, train)
            y = _HarDBlock(
                self.gr[i], self.grmul, max(self.n_layers[i] // 2, 2), norm=norm,
                name=f"dec_block{i}",
            )(y, train)

        y = Dropout2d(0.1)(y, train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
        return (resize_bilinear(out, size, align_corners=True),)


@MODEL_REGISTRY.register(name="HardNet")
def _hardnet(nclass, encoder_norm, decoder_norm):
    return HardNet(
        nclass=nclass,
        backbone="",
        aux=False,
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
