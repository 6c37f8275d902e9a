"""Model registry + factory
(reference: ``segmentron/models/model_zoo.py::get_segmentation_model``).
"""

from __future__ import annotations

from typing import Optional

from ..config import cfg
from ..data.dataloader import datasets
from ..modules.batch_norm import norm_from_cfg
from ..utils import get_logger
from ..utils.registry import Registry

MODEL_REGISTRY = Registry("MODEL")

__all__ = ["MODEL_REGISTRY", "get_segmentation_model"]


def get_segmentation_model():
    """Build the model named by ``cfg.MODEL.MODEL_NAME``.

    Registered entries are callables ``(nclass, encoder_norm,
    decoder_norm) -> nn.Module`` reading any model-specific toggles
    from cfg themselves.
    """
    name = cfg.MODEL.MODEL_NAME
    nclass = datasets[cfg.DATASET.NAME.lower()].NUM_CLASS
    ctor = MODEL_REGISTRY.get(name)
    model = ctor(
        nclass=nclass,
        encoder_norm=norm_from_cfg(cfg, encoder=True),
        decoder_norm=norm_from_cfg(cfg, encoder=False),
    )
    get_logger().info("Built model %s (backbone=%s, nclass=%d)",
                      name, cfg.MODEL.BACKBONE, nclass)
    return model
