"""Pascal VOC 2012 (reference: ``segmentron/data/dataloader/pascal_voc.py``).

21 classes (background + 20), splits from ``ImageSets/Segmentation``.
Boundary pixels (raw 255) map to ignore -1.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from .seg_data_base import SegmentationDataset

__all__ = ["VOCSegmentation"]


class VOCSegmentation(SegmentationDataset):
    NUM_CLASS = 21

    CLASSES = (
        "background", "airplane", "bicycle", "bird", "boat", "bottle", "bus",
        "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
        "motorcycle", "person", "potted-plant", "sheep", "sofa", "train",
        "tv",
    )

    def __init__(
        self,
        root: str = "datasets/voc/VOC2012",
        split: str = "train",
        mode=None,
        **kwargs,
    ):
        super().__init__(root, split, mode, **kwargs)
        image_dir = os.path.join(self.root, "JPEGImages")
        mask_dir = os.path.join(self.root, "SegmentationClass")
        split_f = os.path.join(
            self.root, "ImageSets", "Segmentation", f"{split}.txt"
        )
        if not os.path.isfile(split_f):
            raise RuntimeError(f"Split file not found: {split_f}")
        with open(split_f) as f:
            names = [line.strip() for line in f if line.strip()]
        self.images = [os.path.join(image_dir, f"{n}.jpg") for n in names]
        self.masks = [os.path.join(mask_dir, f"{n}.png") for n in names]

    def __len__(self) -> int:
        return len(self.images)

    def _mask_transform(self, mask: Image.Image) -> np.ndarray:
        arr = np.asarray(mask, np.int32)
        return np.where(arr == 255, -1, arr).astype(np.int32)

    def __getitem__(self, index: int):
        from .._native import open_rgb

        img = open_rgb(self.images[index], lazy=self.mode == "train")
        if self.mode == "test":
            return self.transform_pair(img, None)[0], None, os.path.basename(
                self.images[index]
            )
        from ..cache import open_mask

        mask = open_mask(self.masks[index])
        img_t, mask_t = self.transform_pair(img, mask, index)
        return img_t, mask_t, os.path.basename(self.images[index])
