"""Pascal VOC augmented with SBD extra masks
(reference: ``segmentron/data/dataloader/pascal_aug.py``).

Masks are Matlab ``.mat`` files (``GTcls.Segmentation``); 21 classes.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from .seg_data_base import SegmentationDataset

__all__ = ["VOCAugSegmentation"]


class VOCAugSegmentation(SegmentationDataset):
    NUM_CLASS = 21
    CLASSES = None  # same as VOCSegmentation

    def __init__(
        self,
        root: str = "datasets/voc",
        split: str = "train",
        mode=None,
        **kwargs,
    ):
        super().__init__(root, split, mode, **kwargs)
        voc_root = os.path.join(self.root, "VOCaug", "dataset")
        image_dir = os.path.join(voc_root, "img")
        mask_dir = os.path.join(voc_root, "cls")
        split_f = os.path.join(voc_root, f"{'trainval' if split == 'train' else split}.txt")
        if not os.path.isfile(split_f):
            raise RuntimeError(f"Split file not found: {split_f}")
        with open(split_f) as f:
            names = [line.strip() for line in f if line.strip()]
        self.images = [os.path.join(image_dir, f"{n}.jpg") for n in names]
        self.masks = [os.path.join(mask_dir, f"{n}.mat") for n in names]

    def __len__(self) -> int:
        return len(self.images)

    def _load_mat_mask(self, path: str) -> Image.Image:
        import scipy.io as sio

        mat = sio.loadmat(
            path, mat_dtype=True, squeeze_me=True, struct_as_record=False
        )
        arr = mat["GTcls"].Segmentation.astype(np.uint8)
        return Image.fromarray(arr)

    def __getitem__(self, index: int):
        from .._native import open_rgb

        img = open_rgb(self.images[index], lazy=self.mode == "train")
        mask = self._load_mat_mask(self.masks[index])
        img_t, mask_t = self.transform_pair(img, mask, index)
        return img_t, mask_t, os.path.basename(self.images[index])
