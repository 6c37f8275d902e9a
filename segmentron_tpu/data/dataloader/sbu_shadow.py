"""SBU shadow dataset — binary segmentation
(reference: ``segmentron/data/dataloader/sbu_shadow.py``).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from .seg_data_base import SegmentationDataset

__all__ = ["SBUSegmentation"]


class SBUSegmentation(SegmentationDataset):
    NUM_CLASS = 2

    def __init__(
        self,
        root: str = "datasets/sbu",
        split: str = "train",
        mode=None,
        **kwargs,
    ):
        super().__init__(root, split, mode, **kwargs)
        sub = "SBUTrain4KRecoveredSmall" if split == "train" else "SBU-Test"
        img_dir = os.path.join(self.root, sub, "ShadowImages")
        mask_dir = os.path.join(self.root, sub, "ShadowMasks")
        if not os.path.isdir(img_dir):
            raise RuntimeError(f"Image dir not found: {img_dir}")
        self.images, self.masks = [], []
        for fname in sorted(os.listdir(img_dir)):
            base = os.path.splitext(fname)[0]
            mpath = os.path.join(mask_dir, base + ".png")
            if os.path.isfile(mpath):
                self.images.append(os.path.join(img_dir, fname))
                self.masks.append(mpath)

    def __len__(self) -> int:
        return len(self.images)

    def _mask_transform(self, mask: Image.Image) -> np.ndarray:
        return (np.asarray(mask.convert("L"), np.int32) > 127).astype(np.int32)

    def __getitem__(self, index: int):
        from .._native import open_rgb

        img = open_rgb(self.images[index], lazy=self.mode == "train")
        from ..cache import open_mask

        mask = open_mask(self.masks[index])
        img_t, mask_t = self.transform_pair(img, mask, index)
        return img_t, mask_t, os.path.basename(self.images[index])
