"""CCNet (reference: ``segmentron/models/ccnet.py``).

Criss-cross attention: each pixel attends to its full row and column
only (H+W-1 positions instead of H*W), recurrently applied
``cfg.MODEL.CCNET.RECURRENCE`` times so context propagates to the full
image. The reference's pure-PyTorch implementation builds the
(H+W)-way affinity with batched matmuls; here the same contraction is
two einsums per step — row and column — which XLA maps straight onto
the MXU with no (HW x HW) materialization.
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

__all__ = ["CCNet", "CrissCrossAttention"]


class CrissCrossAttention(nn.Module):
    """One criss-cross step: softmax over (col ++ row) affinities."""

    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        b, h, w, ch = x.shape
        inter = max(ch // self.reduction, 1)
        q = conv2d(inter, 1, 1, 0, name="query")(x)
        k = conv2d(inter, 1, 1, 0, name="key")(x)
        v = conv2d(ch, 1, 1, 0, name="value")(x)

        f32 = jnp.float32
        # column affinity: pixel (i,j) vs all (i',j) — mask the i'==i slot
        # so self-attention is only counted once (in the row branch),
        # matching the reference's -inf diagonal trick.
        e_col = jnp.einsum("bijc,bkjc->bijk", q.astype(f32), k.astype(f32))
        e_col = e_col + jnp.where(
            jnp.eye(h, dtype=bool)[None, :, None, :], -1e9, 0.0
        )
        # row affinity: pixel (i,j) vs all (i,j')
        e_row = jnp.einsum("bijc,bikc->bijk", q.astype(f32), k.astype(f32))
        att = nn.softmax(jnp.concatenate([e_col, e_row], axis=-1), axis=-1)
        a_col, a_row = att[..., :h], att[..., h:]
        out = jnp.einsum("bijk,bkjc->bijc", a_col, v.astype(f32)) + jnp.einsum(
            "bijk,bikc->bijc", a_row, v.astype(f32)
        )
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + (gamma * out).astype(x.dtype)


class CCNet(SegBaseModel):
    recurrence: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        norm = self.decoder_norm
        _, _, c3, c4 = self.base_forward(x, train)

        y = ConvBNReLU(512, 3, norm=norm, name="conva")(c4, train)
        cca = CrissCrossAttention(name="cca")
        for _ in range(self.recurrence):
            y = cca(y)
        y = ConvBNReLU(512, 3, norm=norm, name="convb")(y, train)

        y = jnp.concatenate([c4, y], axis=-1)
        y = ConvBNReLU(512, 3, norm=norm, name="bottleneck")(y, train)
        y = Dropout2d(0.1)(y, train)
        out = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
        outputs = [resize_bilinear(out, size, align_corners=True)]
        if self.aux:
            auxout = FCNHead(self.nclass, norm=norm, name="auxlayer")(c3, train)
            outputs.append(resize_bilinear(auxout, size, align_corners=True))
        return tuple(outputs)


@MODEL_REGISTRY.register(name="CCNet")
def _ccnet(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    return CCNet(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower() or "resnet101",
        aux=bool(cfg.SOLVER.AUX),
        recurrence=int(cfg.MODEL.CCNET.RECURRENCE),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
