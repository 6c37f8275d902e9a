"""DFANet (reference: ``segmentron/models/dfanet.py``).

Deep Feature Aggregation: a lightweight Xception-A encoder is run
three times; each pass re-ingests the previous pass's attention-gated
output concatenated with its own /4 feature ("sub-network aggregation"),
and the decoder sums per-pass /4 features plus upsampled attention
outputs ("sub-stage aggregation").
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ConvBNReLU, SeparableConv2d
from ..modules.basic import conv2d
from ..modules.batch_norm import NormConfig
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["DFANet"]


class _XABlock(nn.Module):
    """Xception-A residual block: 3 separable convs, optional stride."""

    features: int
    stride: int = 1
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = self.features // 4
        y = SeparableConv2d(inter, 3, 1, norm=self.norm, relu_first=True,
                            name="sep1")(x, train)
        y = SeparableConv2d(inter, 3, 1, norm=self.norm, relu_first=True,
                            name="sep2")(y, train)
        y = SeparableConv2d(self.features, 3, self.stride, norm=self.norm,
                            relu_first=True, name="sep3")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            sc = conv2d(self.features, 1, self.stride, 0, name="skip_conv")(x)
            sc = self.norm.make(name="skip_bn")(sc, use_running_average=not train)
        else:
            sc = x
        return y + sc


class _XceptionAStage(nn.Module):
    features: int
    n_blocks: int = 3
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _XABlock(self.features, 2, norm=self.norm, name="block0")(x, train)
        for i in range(1, self.n_blocks):
            y = _XABlock(self.features, 1, norm=self.norm, name=f"block{i}")(
                y, train
            )
        return y


class _FCAttention(nn.Module):
    """Global pool -> fc -> 1x1 conv channel gate (paper's fc attention)."""

    features: int
    fc_dim: int = 1000

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(1, 2))
        g = nn.Dense(self.fc_dim, name="fc")(g)
        g = conv2d(self.features, 1, 1, 0, use_bias=True, name="conv")(
            g[:, None, None, :]
        )
        return x * nn.sigmoid(g)


class _EncoderPass(nn.Module):
    """One Xception-A pass: returns (/4, /8, /16, attention(/16))."""

    channels: Sequence[int] = (48, 96, 192)
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        e2 = _XceptionAStage(self.channels[0], 3, norm=self.norm, name="enc2")(
            x, train
        )
        e3 = _XceptionAStage(self.channels[1], 3, norm=self.norm, name="enc3")(
            e2, train
        )
        e4 = _XceptionAStage(self.channels[2], 3, norm=self.norm, name="enc4")(
            e3, train
        )
        fca = _FCAttention(self.channels[2], name="fca")(e4)
        return e2, e3, e4, fca


class DFANet(SegBaseModel):
    decoder_ch: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm

        stem = ConvBNReLU(8, 3, 2, norm=norm, name="stem")(x, train)  # /2

        e2s, fcas = [], []
        inp = stem
        for p in range(3):
            e2, e3, e4, fca = _EncoderPass(norm=norm, name=f"pass{p}")(inp, train)
            e2s.append(e2)
            fcas.append(fca)
            if p < 2:
                up = resize_bilinear(fca, e2.shape[1:3], align_corners=True)
                inp = jnp.concatenate([e2, up], axis=-1)

        # decoder: sum of /4 features + sum of upsampled attention outputs
        tgt = e2s[0].shape[1:3]
        dec = None
        for p, e2 in enumerate(e2s):
            y = ConvBNReLU(self.decoder_ch, 1, padding=0, norm=norm,
                           name=f"dec_e2_{p}")(e2, train)
            y = resize_bilinear(y, tgt, align_corners=True)
            dec = y if dec is None else dec + y
        for p, fca in enumerate(fcas):
            y = ConvBNReLU(self.decoder_ch, 1, padding=0, norm=norm,
                           name=f"dec_fca_{p}")(fca, train)
            y = resize_bilinear(y, tgt, align_corners=True)
            dec = dec + y

        dec = ConvBNReLU(self.decoder_ch, 3, norm=norm, name="dec_conv")(dec, train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(dec)
        return (resize_bilinear(out, size, align_corners=True),)


@MODEL_REGISTRY.register(name="DFANet")
def _dfanet(nclass, encoder_norm, decoder_norm):
    return DFANet(
        nclass=nclass,
        backbone="",
        aux=False,
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
