"""DANet — dual attention (reference: ``segmentron/models/danet.py``).

Position Attention (PAM): (HW x HW) spatial affinity softmax over c4
features; Channel Attention (CAM): (C x C) channel affinity. Their
fused sum plus the two individual branches give three outputs
(weighted by ``cfg.MODEL.MULTI_LOSS_WEIGHT``).

TPU notes: the PAM affinity is the framework's true "long-context" hot
spot — einsum here (XLA batches it onto the MXU); the blockwise Pallas
flash-attention variant in ``segmentron_tpu.ops.attention`` replaces it
for large inputs (gated by ``cfg.TPU.USE_PALLAS``) so 768²+ training
fits HBM without materialising HW².
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..modules import ConvBNReLU, Dropout2d
from ..modules.basic import conv2d
from ..modules.batch_norm import NormConfig
from ..ops import resize_bilinear
from ..ops.attention import spatial_attention
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["DANet", "PAM", "CAM"]


class PAM(nn.Module):
    """Position attention module."""

    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        q = conv2d(c // 8, 1, 1, 0, use_bias=True, name="query")(x)
        k = conv2d(c // 8, 1, 1, 0, use_bias=True, name="key")(x)
        v = conv2d(c, 1, 1, 0, use_bias=True, name="value")(x)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        out = spatial_attention(
            q.reshape(n, h * w, c // 8),
            k.reshape(n, h * w, c // 8),
            v.reshape(n, h * w, c),
            use_pallas=self.use_pallas,
        ).reshape(n, h, w, c)
        return gamma * out + x


class CAM(nn.Module):
    """Channel attention module: affinity over channels (C x C)."""

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        flat = x.reshape(n, h * w, c)
        energy = jnp.einsum(
            "npc,npd->ncd", flat, flat, preferred_element_type=jnp.float32
        )
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = nn.softmax(energy, axis=-1)
        out = jnp.einsum(
            "ncd,npd->npc", attn, flat, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * out.reshape(n, h, w, c) + x


class DANet(SegBaseModel):
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        c1, c2, c3, c4 = self.base_forward(x, train)
        inter = c4.shape[-1] // 4

        pa = ConvBNReLU(inter, 3, norm=self.decoder_norm, name="conv_p1")(c4, train)
        pa = PAM(use_pallas=self.use_pallas, name="pam")(pa)
        pa = ConvBNReLU(inter, 3, norm=self.decoder_norm, name="conv_p2")(pa, train)

        ca = ConvBNReLU(inter, 3, norm=self.decoder_norm, name="conv_c1")(c4, train)
        ca = CAM(name="cam")(ca)
        ca = ConvBNReLU(inter, 3, norm=self.decoder_norm, name="conv_c2")(ca, train)

        fused = pa + ca
        out = Dropout2d(0.1)(fused, train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="out")(out)
        outputs = [resize_bilinear(out, size, align_corners=True)]
        if self.aux:
            p_out = Dropout2d(0.1)(pa, train)
            p_out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="p_out")(p_out)
            c_out = Dropout2d(0.1)(ca, train)
            c_out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="c_out")(c_out)
            outputs.append(resize_bilinear(p_out, size, align_corners=True))
            outputs.append(resize_bilinear(c_out, size, align_corners=True))
        return tuple(outputs)


@MODEL_REGISTRY.register(name="DANet")
def _danet(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return DANet(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower(),
        aux=bool(cfg.SOLVER.AUX),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
        use_pallas=bool(cfg.TPU.USE_PALLAS),
    )
