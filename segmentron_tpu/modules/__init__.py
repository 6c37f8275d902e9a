from .batch_norm import NormConfig, FrozenBatchNorm, norm_from_cfg
from .basic import conv2d, ConvBNReLU, SeparableConv2d, InvertedResidual
from .module import FCNHead, ASPP, PyramidPooling, Dropout2d

__all__ = [
    "NormConfig",
    "FrozenBatchNorm",
    "norm_from_cfg",
    "conv2d",
    "ConvBNReLU",
    "SeparableConv2d",
    "InvertedResidual",
    "FCNHead",
    "ASPP",
    "PyramidPooling",
    "Dropout2d",
]
