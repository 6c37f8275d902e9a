from .dataloader import datasets, get_segmentation_dataset, SegmentationDataset
from .loader import DataLoader

__all__ = ["datasets", "get_segmentation_dataset", "SegmentationDataset", "DataLoader"]
