"""Basic conv blocks (reference: ``segmentron/modules/basic.py``).

NHWC / HWIO throughout (TPU-native layout). Convolutions use explicit
symmetric padding to match torch's integer ``padding=`` semantics, and
``use_bias=False`` wherever a norm follows (reference convention).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from .batch_norm import NormConfig

__all__ = ["conv2d", "ConvBNReLU", "SeparableConv2d", "InvertedResidual"]


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(
    features: int,
    kernel_size: Union[int, Sequence[int]] = 3,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int], str, None] = None,
    dilation: Union[int, Sequence[int]] = 1,
    groups: int = 1,
    use_bias: bool = False,
    name: Optional[str] = None,
) -> nn.Conv:
    """torch-``Conv2d``-parameterised flax Conv (NHWC/HWIO).

    ``padding=None`` means the torch-reference default of
    ``dilation * (k - 1) // 2`` ('same' for odd kernels), which is what
    the reference uses for every 3x3.
    """
    k = _pair(kernel_size)
    d = _pair(dilation)
    if padding is None:
        padding = (d[0] * (k[0] - 1) // 2, d[1] * (k[1] - 1) // 2)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(padding, (tuple, list)):
        padding = [(padding[0], padding[0]), (padding[1], padding[1])]
    return nn.Conv(
        features=features,
        kernel_size=k,
        strides=_pair(stride),
        padding=padding,
        kernel_dilation=d,
        feature_group_count=groups,
        use_bias=use_bias,
        name=name,
    )


class ConvBNReLU(nn.Module):
    """Conv -> Norm -> activation (reference ``_ConvBNReLU``/``_ConvBNPReLU``)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int], None] = None
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    norm: NormConfig = NormConfig()
    act: Optional[Callable] = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            self.dilation,
            self.groups,
            name="conv",
        )(x)
        x = self.norm.make(name="bn")(x, use_running_average=not train)
        if self.act is not None:
            x = self.act(x)
        return x


class SeparableConv2d(nn.Module):
    """Depthwise 3x3 (+norm[/relu]) then pointwise 1x1 (+norm).

    Reference ``SeparableConv2d`` — the workhorse of Xception and the
    DeepLabv3+ decoder. ``relu_first=False`` matches the reference's
    aligned-Xception block ordering (dw -> BN -> pw -> BN), with an
    optional ReLU between dw-BN and pw as in the decoder blocks.
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    dilation: Union[int, Sequence[int]] = 1
    norm: NormConfig = NormConfig()
    relu_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        if self.relu_first:
            x = nn.relu(x)
        x = conv2d(
            in_ch,
            self.kernel_size,
            self.stride,
            None,
            self.dilation,
            groups=in_ch,
            name="depthwise",
        )(x)
        x = self.norm.make(name="dw_bn")(x, use_running_average=not train)
        x = conv2d(self.features, 1, 1, 0, 1, name="pointwise")(x)
        x = self.norm.make(name="pw_bn")(x, use_running_average=not train)
        return x


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (reference block; lives here since
    the seg decoder reuses it)."""

    features: int
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_res = self.stride == 1 and in_ch == self.features
        y = x
        if self.expand_ratio != 1:
            y = ConvBNReLU(
                hidden, 1, 1, 0, norm=self.norm, act=nn.relu6, name="expand"
            )(y, train)
        y = ConvBNReLU(
            hidden,
            3,
            self.stride,
            None,
            self.dilation,
            groups=hidden,
            norm=self.norm,
            act=nn.relu6,
            name="depthwise",
        )(y, train)
        y = conv2d(self.features, 1, 1, 0, name="project")(y)
        y = self.norm.make(name="project_bn")(y, use_running_average=not train)
        return x + y if use_res else y
