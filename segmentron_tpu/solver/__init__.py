from .loss import get_segmentation_loss
from .lr_scheduler import (
    get_lr_scheduler,
    warmup_poly_lr,
    warmup_cosine_lr,
    warmup_step_lr,
)
from .optimizer import get_optimizer, backbone_decoder_labels

__all__ = [
    "get_segmentation_loss",
    "get_lr_scheduler",
    "warmup_poly_lr",
    "warmup_cosine_lr",
    "warmup_step_lr",
    "get_optimizer",
    "backbone_decoder_labels",
]
