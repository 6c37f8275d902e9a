"""CGNet (reference: ``segmentron/models/cgnet.py``).

Context Guided Network (Wu et al., 2018): a light-weight from-scratch
model. Each CG block jointly learns local features (3x3 depthwise),
surrounding context (dilated 3x3 depthwise) and global context
(GAP -> FC gate). Stages: 3 convs (/2), M CG blocks (/4, dil 2),
N CG blocks (/8, dil 4), with raw-input injection at each scale.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..modules.basic import conv2d
from ..modules.batch_norm import NormConfig
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["CGNet"]


class _ConvBNPReLU(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.features, self.kernel_size, self.stride, name="conv")(x)
        x = self.norm.make(name="bn")(x, use_running_average=not train)
        alpha = self.param("prelu", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)


class _BNPReLU(nn.Module):
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.norm.make(name="bn")(x, use_running_average=not train)
        alpha = self.param("prelu", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)


class _GlobalContext(nn.Module):
    """F_glo: GAP -> FC -> ReLU -> FC -> sigmoid channel gate."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2))
        g = nn.Dense(max(ch // self.reduction, 4), name="fc1")(g)
        g = nn.relu(g)
        g = nn.Dense(ch, name="fc2")(g)
        g = nn.sigmoid(g)
        return x * g[:, None, None, :]


class _CGBlock(nn.Module):
    """Context Guided block: f_loc || f_sur -> BN+PReLU -> [reduce] -> F_glo."""

    features: int
    dilation: int = 2
    reduction: int = 16
    down: bool = False  # downsampling variant (stride-2, no residual)
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.features if self.down else self.features // 2
        stride = 2 if self.down else 1
        y = _ConvBNPReLU(n, 3 if self.down else 1, stride, norm=self.norm,
                         name="conv1x1")(x, train)
        loc = conv2d(n, 3, 1, None, 1, groups=n, name="f_loc")(y)
        sur = conv2d(n, 3, 1, None, self.dilation, groups=n, name="f_sur")(y)
        joi = jnp.concatenate([loc, sur], axis=-1)
        joi = _BNPReLU(norm=self.norm, name="bn_prelu")(joi, train)
        if self.down:
            joi = conv2d(self.features, 1, 1, 0, name="reduce")(joi)
        out = _GlobalContext(self.reduction, name="f_glo")(joi)
        if not self.down:
            out = x + out
        return out


class _InputInjection(nn.Module):
    """Average-pool the raw input down by 2**times."""

    times: int

    def __call__(self, x):
        for _ in range(self.times):
            x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


class CGNet(SegBaseModel):
    m_blocks: int = 3
    n_blocks: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm

        # stage 1 (/2)
        y = _ConvBNPReLU(32, 3, 2, norm=norm, name="stage1_0")(x, train)
        y = _ConvBNPReLU(32, 3, 1, norm=norm, name="stage1_1")(y, train)
        y = _ConvBNPReLU(32, 3, 1, norm=norm, name="stage1_2")(y, train)
        inp1 = _InputInjection(1, name="sample1")(x)
        inp2 = _InputInjection(2, name="sample2")(x)
        y = _BNPReLU(norm=norm, name="b1")(jnp.concatenate([y, inp1], -1), train)

        # stage 2 (/4): M CG blocks, dilation 2
        y0 = _CGBlock(64, 2, 8, down=True, norm=norm, name="stage2_down")(y, train)
        z = y0
        for i in range(self.m_blocks - 1):
            z = _CGBlock(64, 2, 8, norm=norm, name=f"stage2_{i}")(z, train)
        y = _BNPReLU(norm=norm, name="b2")(
            jnp.concatenate([z, y0, inp2], -1), train
        )

        # stage 3 (/8): N CG blocks, dilation 4
        y0 = _CGBlock(128, 4, 16, down=True, norm=norm, name="stage3_down")(y, train)
        z = y0
        for i in range(self.n_blocks - 1):
            z = _CGBlock(128, 4, 16, norm=norm, name=f"stage3_{i}")(z, train)
        y = _BNPReLU(norm=norm, name="b3")(jnp.concatenate([z, y0], -1), train)

        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
        return (resize_bilinear(out, size, align_corners=True),)


@MODEL_REGISTRY.register(name="CGNet")
def _cgnet(nclass, encoder_norm, decoder_norm):
    return CGNet(
        nclass=nclass,
        backbone="",
        aux=False,
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
