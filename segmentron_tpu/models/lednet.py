"""LEDNet (reference: ``segmentron/models/lednet.py``).

Light encoder-decoder: the encoder stacks downsample units
(conv-s2 || maxpool concat) and split-shuffle non-bottleneck (SS-nbt)
blocks with growing dilation; the decoder is an attention pyramid
network (APN) that emits class logits directly at 1/8 resolution.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..modules.basic import conv2d
from ..modules.batch_norm import NormConfig
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["LEDNet"]


def _channel_shuffle(x, groups: int = 2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(b, h, w, c)


class _Down(nn.Module):
    """Concat of stride-2 conv and 2x2 maxpool (ENet-style)."""

    features: int
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        conv_ch = max(self.features - in_ch, 1)
        a = conv2d(conv_ch, 3, 2, use_bias=True, name="conv")(x)
        p = nn.max_pool(x, (2, 2), strides=(2, 2))
        y = jnp.concatenate([a, p], axis=-1)
        y = self.norm.make(name="bn")(y, use_running_average=not train)
        return nn.relu(y)


class _SSnbt(nn.Module):
    """Split-shuffle non-bottleneck: two half-channel branches of
    factorized 3x1/1x3 convs (second pair dilated), concat, residual,
    channel shuffle."""

    dilation: int = 1
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        l, r = x[..., :c], x[..., c:]
        d = self.dilation

        l = nn.relu(conv2d(c, (3, 1), 1, (1, 0), use_bias=True, name="l_conv1")(l))
        l = nn.relu(conv2d(c, (1, 3), 1, (0, 1), use_bias=True, name="l_conv2")(l))
        l = self.norm.make(name="l_bn1")(l, use_running_average=not train)
        l = nn.relu(l)
        l = nn.relu(
            conv2d(c, (3, 1), 1, (d, 0), (d, 1), use_bias=True, name="l_conv3")(l)
        )
        l = conv2d(c, (1, 3), 1, (0, d), (1, d), use_bias=True, name="l_conv4")(l)
        l = self.norm.make(name="l_bn2")(l, use_running_average=not train)

        r = nn.relu(conv2d(c, (1, 3), 1, (0, 1), use_bias=True, name="r_conv1")(r))
        r = nn.relu(conv2d(c, (3, 1), 1, (1, 0), use_bias=True, name="r_conv2")(r))
        r = self.norm.make(name="r_bn1")(r, use_running_average=not train)
        r = nn.relu(r)
        r = nn.relu(
            conv2d(c, (1, 3), 1, (0, d), (1, d), use_bias=True, name="r_conv3")(r)
        )
        r = conv2d(c, (3, 1), 1, (d, 0), (d, 1), use_bias=True, name="r_conv4")(r)
        r = self.norm.make(name="r_bn2")(r, use_running_average=not train)

        y = nn.relu(x + jnp.concatenate([l, r], axis=-1))
        return _channel_shuffle(y, 2)


class _APN(nn.Module):
    """Attention pyramid head: nested 3/5/7 stride-2 conv pyramid gates a
    1x1 branch; global-pool branch added on top. Emits nclass maps."""

    nclass: int
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        n = self.nclass

        def cbr(f, k, s, name):
            def run(z):
                z = conv2d(f, k, s, use_bias=True, name=f"{name}_conv")(z)
                z = self.norm.make(name=f"{name}_bn")(
                    z, use_running_average=not train
                )
                return nn.relu(z)

            return run

        # pyramid: /2 (7x7), /4 (5x5), /8 (3x3)
        d1 = cbr(n, 7, 2, "down1")(x)
        d2 = cbr(n, 5, 2, "down2")(d1)
        d3 = cbr(n, 3, 2, "down3")(d2)
        d3 = cbr(n, 3, 1, "down3b")(d3)
        y = resize_bilinear(d3, d2.shape[1:3], align_corners=True)
        y = y + cbr(n, 5, 1, "lat2")(d2)
        y = resize_bilinear(y, d1.shape[1:3], align_corners=True)
        y = y + cbr(n, 7, 1, "lat1")(d1)
        y = resize_bilinear(y, size, align_corners=True)

        mid = cbr(n, 1, 1, "mid")(x)
        out = mid * y

        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = conv2d(n, 1, 1, 0, use_bias=True, name="global_conv")(g)
        return out + g


class LEDNet(SegBaseModel):
    dilations: Sequence[int] = (1, 2, 5, 9, 2, 5, 9, 17)

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm

        y = _Down(32, norm=norm, name="down1")(x, train)
        for i in range(3):
            y = _SSnbt(1, norm=norm, name=f"ssnbt1_{i}")(y, train)
        y = _Down(64, norm=norm, name="down2")(y, train)
        for i in range(2):
            y = _SSnbt(1, norm=norm, name=f"ssnbt2_{i}")(y, train)
        y = _Down(128, norm=norm, name="down3")(y, train)
        for i, d in enumerate(self.dilations):
            y = _SSnbt(d, norm=norm, name=f"ssnbt3_{i}")(y, train)

        out = _APN(self.nclass, norm=norm, name="apn")(y, train)
        return (resize_bilinear(out, size, align_corners=True),)


@MODEL_REGISTRY.register(name="LEDNet")
def _lednet(nclass, encoder_norm, decoder_norm):
    return LEDNet(
        nclass=nclass,
        backbone="",
        aux=False,
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
