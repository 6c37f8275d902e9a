"""Backbone registry (reference: ``segmentron/models/backbones/build.py``)."""

from __future__ import annotations

from typing import Optional

from ...config import cfg
from ...modules.batch_norm import NormConfig
from ...utils import get_logger
from ...utils.registry import Registry

BACKBONE_REGISTRY = Registry("BACKBONE")

__all__ = ["BACKBONE_REGISTRY", "get_segmentation_backbone"]


def get_segmentation_backbone(backbone: str, norm: NormConfig, name=None):
    """Instantiate a registered backbone module by name.

    ``name`` fixes the flax param scope (models use "backbone" so the
    solver can split LR by path prefix).
    """
    ctor = BACKBONE_REGISTRY.get(backbone)
    return ctor(norm=norm, name=name)
