"""HRNet segmentation head (+ optional OCR)
(reference: ``segmentron/models/hrnet_seg.py``).

HRNetV2 head: upsample the 4-branch pyramid to 1/4 resolution, concat,
1x1 ConvBNReLU, classifier, upsample to input.

OCR (object-contextual representations) option for the HRNet-W48+OCR
benchmark config: soft object regions from an aux head gather per-class
region features; pixel-region attention redistributes them as context.
The two matmuls (region gather K x HW and context scatter HW x K) are
MXU-friendly einsums — K=nclass is tiny, so unlike DANet's HWxHW this
needs no blockwise kernel.
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

__all__ = ["HRNetSeg"]


class SpatialGather(nn.Module):
    """Aggregate pixel features into per-class region features via the
    softmaxed soft-region map: out[k] = sum_i softmax(probs)[k,i] * x[i]."""

    @nn.compact
    def __call__(self, feats, probs):
        n, h, w, c = feats.shape
        k = probs.shape[-1]
        probs2 = probs.reshape(n, h * w, k)
        feats2 = feats.reshape(n, h * w, c)
        attn = nn.softmax(probs2, axis=1)  # normalize over pixels
        # (N, K, C)
        return jnp.einsum(
            "npk,npc->nkc", attn, feats2, preferred_element_type=jnp.float32
        ).astype(feats.dtype)


class ObjectAttention(nn.Module):
    """Pixel-to-region attention (OCR's ObjectAttentionBlock)."""

    key_channels: int = 256
    out_channels: int = 512
    norm: NormConfig = NormConfig()

    @nn.compact
    def __call__(self, x, regions, train: bool = False):
        n, h, w, c = x.shape
        k = regions.shape[1]
        q = ConvBNReLU(self.key_channels, 1, padding=0, norm=self.norm, name="f_pixel")(
            x, train
        ).reshape(n, h * w, self.key_channels)
        key = ConvBNReLU(
            self.key_channels, 1, padding=0, norm=self.norm, name="f_object"
        )(regions[:, :, None, :], train).reshape(n, k, self.key_channels)
        v = ConvBNReLU(
            self.key_channels, 1, padding=0, norm=self.norm, name="f_down"
        )(regions[:, :, None, :], train).reshape(n, k, self.key_channels)
        sim = jnp.einsum(
            "npc,nkc->npk", q, key, preferred_element_type=jnp.float32
        ) * (self.key_channels ** -0.5)
        attn = nn.softmax(sim, axis=-1)
        ctx = jnp.einsum(
            "npk,nkc->npc", attn, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        ctx = ctx.reshape(n, h, w, self.key_channels)
        ctx = ConvBNReLU(self.out_channels, 1, padding=0, norm=self.norm, name="f_up")(
            ctx, train
        )
        return ctx


class HRNetSeg(SegBaseModel):
    ocr_enable: bool = False
    ocr_mid_channels: int = 512
    ocr_key_channels: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        branches = self.base_forward(x, train)
        hi_size = branches[0].shape[1:3]
        ups = [branches[0]] + [
            resize_bilinear(b, hi_size, align_corners=True) for b in branches[1:]
        ]
        feats = jnp.concatenate(ups, axis=-1)

        if not self.ocr_enable:
            y = ConvBNReLU(
                feats.shape[-1], 1, padding=0, norm=self.decoder_norm, name="last_layer"
            )(feats, train)
            out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
            return (resize_bilinear(out, size, align_corners=True),)

        # --- OCR path ---
        # soft object regions (also the aux output)
        aux = ConvBNReLU(
            feats.shape[-1], 1, padding=0, norm=self.decoder_norm, name="aux_conv"
        )(feats, train)
        aux = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="aux_classifier")(aux)
        pixels = ConvBNReLU(
            self.ocr_mid_channels, 3, norm=self.decoder_norm, name="conv3x3_ocr"
        )(feats, train)
        regions = SpatialGather(name="gather")(pixels, aux)
        ctx = ObjectAttention(
            key_channels=self.ocr_key_channels,
            out_channels=self.ocr_mid_channels,
            norm=self.decoder_norm,
            name="ocr_attn",
        )(pixels, regions, train)
        y = jnp.concatenate([ctx, pixels], axis=-1)
        y = ConvBNReLU(
            self.ocr_mid_channels, 1, padding=0, norm=self.decoder_norm,
            name="ocr_fuse",
        )(y, train)
        y = Dropout2d(0.05)(y, train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
        return (
            resize_bilinear(out, size, align_corners=True),
            resize_bilinear(aux, size, align_corners=True),
        )


@MODEL_REGISTRY.register(name="HRNet")
def _hrnet_seg(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return HRNetSeg(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower(),
        aux=bool(cfg.SOLVER.AUX),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
        ocr_enable=bool(cfg.MODEL.HRNET.OCR.ENABLE),
        ocr_mid_channels=int(cfg.MODEL.HRNET.OCR.MID_CHANNELS),
        ocr_key_channels=int(cfg.MODEL.HRNET.OCR.KEY_CHANNELS),
    )
