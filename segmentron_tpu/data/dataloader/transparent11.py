"""Trans10K transparent-object segmentation
(reference: ``segmentron/data/dataloader/transparent11.py`` [filename TBV]).

11 fine-grained transparent classes + background (Trans10K-v2 layout:
``<root>/<split>/images`` + ``<root>/<split>/masks_12``).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from .seg_data_base import SegmentationDataset

__all__ = ["TransparentSegmentation"]


class TransparentSegmentation(SegmentationDataset):
    NUM_CLASS = 12

    def __init__(
        self,
        root: str = "datasets/transparent/Trans10K_cls12",
        split: str = "train",
        mode=None,
        **kwargs,
    ):
        super().__init__(root, split, mode, **kwargs)
        sub = {"train": "train", "val": "validation", "test": "test"}.get(split, split)
        img_dir = os.path.join(self.root, sub, "images")
        mask_dir = os.path.join(self.root, sub, "masks_12")
        if not os.path.isdir(img_dir):
            raise RuntimeError(f"Image dir not found: {img_dir}")
        self.images, self.masks = [], []
        for fname in sorted(os.listdir(img_dir)):
            base = os.path.splitext(fname)[0]
            mpath = os.path.join(mask_dir, base + "_mask.png")
            if os.path.isfile(mpath):
                self.images.append(os.path.join(img_dir, fname))
                self.masks.append(mpath)

    def __len__(self) -> int:
        return len(self.images)

    def _mask_transform(self, mask: Image.Image) -> np.ndarray:
        arr = np.asarray(mask, np.int32)
        if arr.ndim == 3:
            arr = arr[..., 0]
        return arr.astype(np.int32)

    def __getitem__(self, index: int):
        from .._native import open_rgb

        img = open_rgb(self.images[index], lazy=self.mode == "train")
        from ..cache import open_mask

        mask = open_mask(self.masks[index])
        img_t, mask_t = self.transform_pair(img, mask, index)
        return img_t, mask_t, os.path.basename(self.images[index])
