from .build import BACKBONE_REGISTRY, get_segmentation_backbone
from . import resnet  # noqa: F401  (registers resnet variants)

__all__ = ["BACKBONE_REGISTRY", "get_segmentation_backbone"]
