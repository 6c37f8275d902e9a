"""EncNet (reference: ``segmentron/models/encnet.py``).

Context Encoding: a learned codebook of K codewords soft-assigns every
c4 pixel, the aggregated residual encoding drives (a) a sigmoid channel
gate on the feature map and (b) the Semantic-Encoding prediction used
by ``encnet_se_loss`` (BCE on per-image class presence). The
pixel-to-codeword assignment is one (B*HW, K) softmax over squared
distances — a pair of MXU matmuls on TPU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ConvBNReLU, Dropout2d, FCNHead
from ..modules.basic import conv2d
from ..modules.batch_norm import NormConfig
from ..ops import resize_bilinear
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["EncNet", "EncModule"]


class _Encoding(nn.Module):
    """Residual encoding layer (Zhang et al., "Deep TEN")."""

    num_codes: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = self.num_codes
        codes = self.param(
            "codewords",
            nn.initializers.uniform(scale=(1.0 / (k * c) ** 0.5) * 2),
            (k, c),
        )
        scale = self.param(
            "scale", nn.initializers.uniform(scale=0.4), (k,)
        )  # reference init: U(-1,0) shifted; sign is learned anyway
        z = x.reshape(b, h * w, c).astype(jnp.float32)
        # squared distances via expansion: ||z||^2 - 2 z.C^T + ||C||^2
        z2 = jnp.sum(z * z, -1, keepdims=True)
        c2 = jnp.sum(codes * codes, -1)
        d2 = z2 - 2.0 * (z @ codes.T) + c2[None, None, :]
        assign = nn.softmax(-scale[None, None, :] * d2, axis=-1)  # (b, hw, k)
        # aggregate residuals: e_k = sum_i a_ik (z_i - c_k)
        agg_z = jnp.einsum("bik,bic->bkc", assign, z)
        agg_c = jnp.sum(assign, axis=1)[..., None] * codes[None]
        return agg_z - agg_c  # (b, k, c)


class EncModule(nn.Module):
    num_codes: int = 32
    se_loss: bool = True
    se_nclass: int = 19
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        e = _Encoding(self.num_codes, name="encoding")(x)
        e = self.norm.make(name="enc_bn")(e, use_running_average=not train)
        e = nn.relu(e)
        e = jnp.mean(e, axis=1)  # (b, c)
        gamma = nn.sigmoid(nn.Dense(c, name="fc")(e))
        y = x * gamma[:, None, None, :].astype(x.dtype)
        outs = [y]
        if self.se_loss:
            outs.append(nn.Dense(self.se_nclass, name="selayer")(e))
        return outs


class EncNet(SegBaseModel):
    num_codes: int = 32
    se_loss: bool = True
    lateral: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm
        _, c2, c3, c4 = self.base_forward(x, train)

        y = ConvBNReLU(512, 3, norm=norm, name="fcn_conv")(c4, train)
        if self.lateral:
            l2 = ConvBNReLU(512, 1, padding=0, norm=norm, name="lateral_c2")(c2, train)
            l3 = ConvBNReLU(512, 1, padding=0, norm=norm, name="lateral_c3")(c3, train)
            l2 = resize_bilinear(l2, y.shape[1:3], align_corners=True)
            l3 = resize_bilinear(l3, y.shape[1:3], align_corners=True)
            y = ConvBNReLU(512, 3, norm=norm, name="fusion")(
                jnp.concatenate([y, l2, l3], axis=-1), train
            )
        enc_outs = EncModule(
            self.num_codes,
            self.se_loss,
            se_nclass=self.nclass,
            norm=norm,
            name="encmodule",
        )(y, train)
        y = Dropout2d(0.1)(enc_outs[0], train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
        outputs = [resize_bilinear(out, size, align_corners=True)]
        if self.se_loss:
            outputs.append(enc_outs[1])  # (b, nclass) presence logits
        if self.aux:
            auxout = FCNHead(self.nclass, norm=norm, name="auxlayer")(c3, train)
            outputs.append(resize_bilinear(auxout, size, align_corners=True))
        return tuple(outputs)


@MODEL_REGISTRY.register(name="EncNet")
def _encnet(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return EncNet(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower() or "resnet101",
        aux=bool(cfg.SOLVER.AUX),
        se_loss=bool(cfg.MODEL.ENCNET.SE_LOSS),
        lateral=bool(cfg.MODEL.ENCNET.LATERAL),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
