"""PointRend (reference: ``segmentron/models/pointrend.py``).

Point-based refinement over a coarse head: during training, sample N
points biased toward the decision boundary (importance sampling over
an oversampled candidate set) and train a shared point MLP on
(fine c1 features ++ coarse logits) at those points. At inference,
iteratively upsample the coarse logits and re-render only the top-K
most uncertain points per step — all with static shapes (fixed N/K and
a fixed step count), so one XLA program serves every image.

Train output: (upsampled coarse logits, point_logits (B,N,C),
point_coords (B,N,2)) consumed by ``pointrend_loss``. Eval output:
(refined logits,).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules import ASPP, ConvBNReLU, FCNHead
from ..modules.basic import conv2d
from ..ops import resize_bilinear
from ..ops.point_sample import point_sample, uncertainty_top2
from .model_zoo import MODEL_REGISTRY
from .segbase import SegBaseModel

__all__ = ["PointRend", "PointHead"]


class PointHead(nn.Module):
    """Shared MLP over per-point (fine ++ coarse) features; the coarse
    logits are re-appended at every layer (paper design)."""

    nclass: int
    channels: int = 256
    depth: int = 3

    @nn.compact
    def __call__(self, fine_pts, coarse_pts):
        y = jnp.concatenate([fine_pts, coarse_pts], axis=-1)
        for i in range(self.depth):
            y = nn.Dense(self.channels, name=f"fc{i}")(y)
            y = nn.relu(y)
            y = jnp.concatenate([y, coarse_pts], axis=-1)
        return nn.Dense(self.nclass, name="predictor")(y)


class PointRend(SegBaseModel):
    base_model: str = "DeepLabV3_Plus"
    num_points: int = 1024
    oversample: int = 3
    importance: float = 0.75
    subdivision_steps: int = 2
    subdivision_points: int = 2048

    def _coarse_head(self, c1, c4, train):
        norm = self.decoder_norm
        if self.base_model.lower().startswith("deeplab"):
            y = ASPP(256, norm=norm, name="head")(c4, train)
            y = resize_bilinear(y, c1.shape[1:3], align_corners=True)
            low = ConvBNReLU(48, 1, padding=0, norm=norm, name="c1_proj")(c1, train)
            y = jnp.concatenate([y, low], axis=-1)
            y = conv2d(self.nclass, 1, 1, 0, use_bias=True, name="classifier")(y)
            return y  # /4 logits
        y = FCNHead(self.nclass, norm=norm, name="head")(c4, train)
        return resize_bilinear(y, c1.shape[1:3], align_corners=True)

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        c1, _, _, c4 = self.base_forward(x, train)
        coarse = self._coarse_head(c1, c4, train)  # (B, H/4, W/4, C)
        point_head = PointHead(self.nclass, name="point_head")
        b = x.shape[0]

        if train:
            n, k, beta = self.num_points, self.oversample, self.importance
            rng = self.make_rng("dropout")
            cand = jax.random.uniform(rng, (b, n * k, 2))
            unc = uncertainty_top2(point_sample(coarse, cand))  # (B, nk)
            n_imp = int(n * beta)
            _, top_idx = jax.lax.top_k(unc, n_imp)
            imp = jnp.take_along_axis(cand, top_idx[..., None], axis=1)
            rand = jax.random.uniform(
                jax.random.fold_in(rng, 1), (b, n - n_imp, 2)
            )
            coords = jnp.concatenate([imp, rand], axis=1)  # (B, N, 2)
            pt_logits = point_head(
                point_sample(c1, coords), point_sample(coarse, coords)
            )
            main = resize_bilinear(coarse, size, align_corners=True)
            return (main, pt_logits, coords)

        # inference: iterative subdivision rendering
        logits = coarse
        for _ in range(self.subdivision_steps):
            nh = min(logits.shape[1] * 2, size[0])
            nw = min(logits.shape[2] * 2, size[1])
            logits = resize_bilinear(logits, (nh, nw), align_corners=True)
            npts = min(self.subdivision_points, nh * nw)
            unc = uncertainty_top2(logits).reshape(b, -1)  # (B, nh*nw)
            _, idx = jax.lax.top_k(unc, npts)
            ys = (idx // nw).astype(jnp.float32)
            xs = (idx % nw).astype(jnp.float32)
            coords = jnp.stack([(xs + 0.5) / nw, (ys + 0.5) / nh], axis=-1)
            refined = point_head(
                point_sample(c1, coords), point_sample(logits, coords)
            )
            flat = logits.reshape(b, nh * nw, self.nclass)
            flat = jax.vmap(lambda f, i, r: f.at[i].set(r))(flat, idx, refined)
            logits = flat.reshape(b, nh, nw, self.nclass)
        return (resize_bilinear(logits, size, align_corners=True),)


@MODEL_REGISTRY.register(name="PointRend")
def _pointrend(nclass, encoder_norm, decoder_norm):
    from ..config import cfg

    pr = cfg.MODEL.POINTREND
    return PointRend(
        nclass=nclass,
        backbone=cfg.MODEL.BACKBONE.lower() or "resnet50",
        aux=False,
        base_model=str(pr.BASEMODEL),
        num_points=int(pr.NUM_POINTS),
        oversample=int(pr.OVERSAMPLE),
        importance=float(pr.IMPORTANCE),
        subdivision_steps=int(pr.SUBDIVISION_STEPS),
        subdivision_points=int(pr.SUBDIVISION_POINTS),
        encoder_norm=encoder_norm,
        decoder_norm=decoder_norm,
    )
