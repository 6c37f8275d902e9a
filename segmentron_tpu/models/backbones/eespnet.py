"""EESPNet backbone (reference: ``segmentron/models/backbones/eespnet.py``).

ESPNetv2 encoder: EESP units = group-pointwise reduce -> K parallel
dilated depthwise 3x3 branches -> hierarchical feature fusion
(cumulative branch sums kill gridding artifacts) -> group-pointwise
expand, with residual. Strided units concat an avg-pooled shortcut and
re-inject the avg-pooled raw image at every scale.

Returns the usual (c1, c2, c3, c4) = (/2, /4, /8, /16) pyramid.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...modules.basic import conv2d
from ...modules.batch_norm import NormConfig
from .build import BACKBONE_REGISTRY

__all__ = ["EESPNet"]


def _prelu(mdl: nn.Module, x, name: str):
    alpha = mdl.param(name, nn.initializers.constant(0.25), (x.shape[-1],))
    return jnp.where(x >= 0, x, alpha * x)


class _CBPR(nn.Module):
    """Conv -> BN -> PReLU."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(
            self.features, self.kernel_size, self.stride, groups=self.groups,
            name="conv",
        )(x)
        x = self.norm.make(name="bn")(x, use_running_average=not train)
        return _prelu(self, x, "prelu")


class _EESP(nn.Module):
    """Extremely Efficient Spatial Pyramid unit."""

    features: int
    stride: int = 1
    branches: int = 4
    max_dilation: int = 8
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.branches
        d = self.features // k
        groups = min(k, d)
        y = _CBPR(d, 1, self.stride, groups=groups, norm=self.norm, name="reduce")(
            x, train
        )
        dilations = [min(2**i, self.max_dilation) for i in range(k)]
        outs = []
        for i, dil in enumerate(dilations):
            b = conv2d(d, 3, 1, None, dil, groups=d, name=f"dw{i}")(y)
            outs.append(b)
        # hierarchical feature fusion: cumulative sums across branches
        fused = [outs[0]]
        for i in range(1, k):
            fused.append(fused[-1] + outs[i])
        z = jnp.concatenate(fused, axis=-1)
        z = self.norm.make(name="hff_bn")(z, use_running_average=not train)
        z = _prelu(self, z, "hff_prelu")
        z = conv2d(self.features, 1, 1, 0, groups=groups, name="expand")(z)
        z = self.norm.make(name="expand_bn")(z, use_running_average=not train)
        if self.stride == 1 and x.shape[-1] == self.features:
            z = z + x
        return _prelu(self, z, "out_prelu")


class _DownEESP(nn.Module):
    """Strided EESP ++ avg-pool shortcut, with raw-image re-injection."""

    features: int
    branches: int = 4
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, img, train: bool = False):
        in_ch = x.shape[-1]
        eesp = _EESP(
            self.features - in_ch, 2, self.branches, norm=self.norm, name="eesp"
        )(x, train)
        pooled = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        y = jnp.concatenate([pooled, eesp], axis=-1)
        # re-inject the avg-pooled raw image
        ih = img.shape[1]
        while ih > y.shape[1]:
            img = nn.avg_pool(img, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            ih = img.shape[1]
        inj = _CBPR(y.shape[-1], 3, 1, norm=self.norm, name="inject")(img, train)
        return _prelu(self, y + inj, "merge_prelu")


class EESPNet(nn.Module):
    """4-stage EESP encoder; width multiplied by ``scale``."""

    norm: NormConfig = NormConfig()
    scale: float = 1.0
    depths: Sequence[int] = (0, 3, 7)  # extra EESP units at /4, /8, /16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        s = self.scale
        chans = [int(round(c * s)) for c in (32, 64, 128, 256)]
        img = x
        c1 = _CBPR(chans[0], 3, 2, norm=self.norm, name="level1")(x, train)  # /2
        c2 = _DownEESP(chans[1], norm=self.norm, name="level2_down")(c1, img, train)
        for i in range(self.depths[0]):
            c2 = _EESP(chans[1], norm=self.norm, name=f"level2_{i}")(c2, train)
        c3 = _DownEESP(chans[2], norm=self.norm, name="level3_down")(c2, img, train)
        for i in range(self.depths[1]):
            c3 = _EESP(chans[2], norm=self.norm, name=f"level3_{i}")(c3, train)
        c4 = _DownEESP(chans[3], norm=self.norm, name="level4_down")(c3, img, train)
        for i in range(self.depths[2]):
            c4 = _EESP(chans[3], norm=self.norm, name=f"level4_{i}")(c4, train)
        return c1, c2, c3, c4


@BACKBONE_REGISTRY.register(name="eespnet")
def _eespnet(norm, name=None):
    from ...config import cfg

    return EESPNet(norm=norm, scale=float(cfg.MODEL.BACKBONE_SCALE), name=name)
