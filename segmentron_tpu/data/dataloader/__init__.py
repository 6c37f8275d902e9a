"""Dataset registry (reference: ``segmentron/data/dataloader/__init__.py``)."""

from .seg_data_base import SegmentationDataset
from .ade import ADE20KSegmentation
from .cityscapes import CitySegmentation
from .pascal_aug import VOCAugSegmentation
from .pascal_voc import VOCSegmentation
from .sbu_shadow import SBUSegmentation
from .synthetic import SyntheticSegmentation
from .transparent11 import TransparentSegmentation

datasets = {
    "ade20k": ADE20KSegmentation,
    "pascal_voc": VOCSegmentation,
    "pascal_aug": VOCAugSegmentation,
    "citys": CitySegmentation,
    "cityscapes": CitySegmentation,
    "sbu": SBUSegmentation,
    "trans10k": TransparentSegmentation,
    "transparent11": TransparentSegmentation,
    "synthetic": SyntheticSegmentation,
}

try:  # pycocotools is optional in this image
    from .coco import COCOSegmentation

    datasets["coco"] = COCOSegmentation
except ImportError:  # pragma: no cover
    COCOSegmentation = None


def get_segmentation_dataset(name: str, **kwargs) -> SegmentationDataset:
    """Instantiate a dataset by registry name."""
    return datasets[name.lower()](**kwargs)


__all__ = ["datasets", "get_segmentation_dataset", "SegmentationDataset"]
