"""Model base (reference: ``segmentron/models/segbase.py::SegBaseModel``).

Each segmentation model is a pure flax module returning a tuple of
logit maps at input resolution: ``(main, *aux)``. Static configuration
(nclass, backbone name, norm settings, per-model toggles) is baked into
module fields at construction — the forward is re-trace-free.

The reference's eval helpers (multi-scale/flip TTA, sliding-window) are
NOT methods here: on TPU they are shape-bucketed drivers in
``segmentron_tpu.engine.tta`` operating on the jitted apply function.

Param-group convention: the backbone lives under the ``"backbone"``
scope so the solver can split LR (decoder x10) by path prefix.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn

from ..modules.batch_norm import NormConfig
from .backbones import get_segmentation_backbone

__all__ = ["SegBaseModel"]


class SegBaseModel(nn.Module):
    """Shared fields + backbone builder for zoo models."""

    nclass: int = 19
    backbone: str = "resnet50"
    aux: bool = False
    encoder_norm: NormConfig = NormConfig()
    decoder_norm: NormConfig = NormConfig()

    def base_forward(self, x, train: bool = False) -> Tuple:
        """Run the backbone under the "backbone" scope; returns (c1..c4)."""
        bb = get_segmentation_backbone(self.backbone, self.encoder_norm, name="backbone")
        return bb(x, train)
