from .build import BACKBONE_REGISTRY, get_segmentation_backbone
from . import resnet  # noqa: F401  (registers resnet variants)
from . import mobilenet  # noqa: F401
from . import xception  # noqa: F401
from . import hrnet  # noqa: F401
from . import eespnet  # noqa: F401

__all__ = ["BACKBONE_REGISTRY", "get_segmentation_backbone"]
