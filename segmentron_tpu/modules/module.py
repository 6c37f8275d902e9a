"""Shared segmentation heads (reference: ``segmentron/modules/module.py``):
``_FCNHead``, ``_ASPP``, ``PyramidPooling``.

TPU notes: the ASPP image-pooling and PSP pyramid branches use the
matmul-based adaptive pool + exact align-corners resize from
``segmentron_tpu.ops`` so the whole head stays on the MXU; all branch
convs are expressed as one fused-width conv where rates allow XLA to
batch them.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import adaptive_avg_pool, global_avg_pool, resize_bilinear
from .basic import ConvBNReLU, SeparableConv2d, conv2d
from .batch_norm import NormConfig

__all__ = ["FCNHead", "ASPP", "PyramidPooling", "Dropout2d"]


class Dropout2d(nn.Module):
    """Channel dropout a la torch's Dropout2d (drops whole channels)."""

    rate: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        # broadcast over spatial dims: mask shape (N, 1, 1, C)
        return nn.Dropout(
            rate=self.rate, broadcast_dims=(1, 2), deterministic=not train
        )(x)


class FCNHead(nn.Module):
    """3x3 ConvBNReLU -> Dropout -> 1x1 classifier (reference ``_FCNHead``)."""

    nclass: int
    channels: Optional[int] = None  # default: in_channels // 4
    norm: NormConfig = NormConfig()
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = self.channels or x.shape[-1] // 4
        x = ConvBNReLU(inter, 3, norm=self.norm, name="block")(x, train)
        x = Dropout2d(self.dropout)(x, train)
        x = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(x)
        return x


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling (reference ``_ASPP``).

    Five parallel branches — 1x1, three 3x3 atrous (rates {12,24,36} at
    OS8 / {6,12,18} at OS16), and global image pooling — concatenated
    and projected. ``separable=True`` uses depthwise-separable atrous
    convs (cfg ASPP_WITH_SEP_CONV).
    """

    out_channels: int = 256
    atrous_rates: Sequence[int] = (6, 12, 18)
    separable: bool = True
    norm: NormConfig = NormConfig()
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        branches = [
            ConvBNReLU(self.out_channels, 1, padding=0, norm=self.norm, name="b0")(
                x, train
            )
        ]
        for i, rate in enumerate(self.atrous_rates):
            if self.separable:
                y = SeparableConv2d(
                    self.out_channels,
                    3,
                    dilation=rate,
                    norm=self.norm,
                    relu_first=False,
                    name=f"b{i + 1}",
                )(x, train)
                y = nn.relu(y)
            else:
                y = ConvBNReLU(
                    self.out_channels,
                    3,
                    dilation=rate,
                    norm=self.norm,
                    name=f"b{i + 1}",
                )(x, train)
            branches.append(y)
        # image pooling branch
        pooled = global_avg_pool(x)
        pooled = ConvBNReLU(
            self.out_channels, 1, padding=0, norm=self.norm, name="image_pool"
        )(pooled, train)
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], size[0], size[1], self.out_channels)
        )
        branches.append(pooled)
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU(self.out_channels, 1, padding=0, norm=self.norm, name="project")(
            y, train
        )
        y = Dropout2d(self.dropout)(y, train)
        return y


class PyramidPooling(nn.Module):
    """PSPNet pyramid pooling (reference ``PyramidPooling``).

    Adaptive pools {1,2,3,6} -> 1x1 ConvBNReLU -> bilinear upsample to
    input size -> concat with input.
    """

    out_channels: Optional[int] = None  # per-branch; default in//4
    bins: Sequence[int] = (1, 2, 3, 6)
    norm: NormConfig = NormConfig()
    align_corners: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        branch_ch = self.out_channels or x.shape[-1] // 4
        outs = [x]
        for i, b in enumerate(self.bins):
            y = adaptive_avg_pool(x, b)
            y = ConvBNReLU(branch_ch, 1, padding=0, norm=self.norm, name=f"p{i}")(
                y, train
            )
            y = resize_bilinear(y, size, align_corners=self.align_corners)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)
