"""COCO mapped to the VOC-like 21-class set
(reference: ``segmentron/data/dataloader/coco.py``).

Uses pycocotools when available; otherwise falls back to the pure-
Python ``_coco_min`` backend (exact RLE codec, PIL polygon fill — see
its module note), so the dataset runs in images without the C
extension. The 20 VOC-equivalent category ids plus background, masks
rasterised from the annotations; images whose mask has <1000 foreground
pixels are filtered at index-build time, as upstream does.
"""

from __future__ import annotations

import os
import pickle
from typing import List

import numpy as np
from PIL import Image

from .seg_data_base import SegmentationDataset

__all__ = ["COCOSegmentation"]

# COCO category ids for the 20 VOC classes, in VOC order (bg first).
CAT_LIST = [0, 5, 2, 16, 9, 44, 6, 3, 17, 62, 21, 67, 18, 19, 4, 1, 64, 20, 63, 7, 72]


class COCOSegmentation(SegmentationDataset):
    NUM_CLASS = 21

    def __init__(
        self,
        root: str = "datasets/coco",
        split: str = "train",
        mode=None,
        **kwargs,
    ):
        super().__init__(root, split, mode, **kwargs)
        try:
            from pycocotools.coco import COCO
            from pycocotools import mask as coco_mask

            self._coco_mask = coco_mask
        except ImportError:
            from ._coco_min import MiniCOCO as COCO

            self._coco_mask = None
        year = "2017"
        anno = "train" if split == "train" else "val"
        ann_file = os.path.join(root, "annotations", f"instances_{anno}{year}.json")
        self.img_dir = os.path.join(root, f"{anno}{year}")
        self.coco = COCO(ann_file)
        ids_file = os.path.join(root, f"{anno}{year}_ids.pkl")
        if os.path.exists(ids_file):
            with open(ids_file, "rb") as f:
                self.ids = pickle.load(f)
        else:
            self.ids = self._preprocess(list(self.coco.imgs.keys()), ids_file)

    def _instance_mask(self, segmentation, h: int, w: int) -> np.ndarray:
        """One annotation's segmentation -> (h, w) binary mask (possibly
        (h, w, k) from pycocotools multi-polygon RLE)."""
        if self._coco_mask is not None:
            rle = self._coco_mask.frPyObjects(segmentation, h, w)
            return self._coco_mask.decode(rle)
        from ._coco_min import ann_to_mask

        return ann_to_mask(segmentation, h, w)

    def _gen_seg_mask(self, target, h: int, w: int) -> np.ndarray:
        mask = np.zeros((h, w), np.uint8)
        for instance in target:
            cat = instance["category_id"]
            if cat not in CAT_LIST:
                continue
            m = self._instance_mask(instance["segmentation"], h, w)
            c = CAT_LIST.index(cat)
            if len(m.shape) < 3:
                mask[:, :] += (mask == 0) * (m * c).astype(np.uint8)
            else:
                mask[:, :] += (mask == 0) * ((m.sum(2) > 0) * c).astype(np.uint8)
        return mask

    def _preprocess(self, ids: List[int], ids_file: str) -> List[int]:
        new_ids = []
        for img_id in ids:
            ann_ids = self.coco.getAnnIds(imgIds=img_id)
            target = self.coco.loadAnns(ann_ids)
            meta = self.coco.loadImgs(img_id)[0]
            mask = self._gen_seg_mask(target, meta["height"], meta["width"])
            if (mask > 0).sum() > 1000:
                new_ids.append(img_id)
        with open(ids_file, "wb") as f:
            pickle.dump(new_ids, f)
        return new_ids

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, index: int):
        img_id = self.ids[index]
        meta = self.coco.loadImgs(img_id)[0]
        from .._native import open_rgb

        img = open_rgb(
            os.path.join(self.img_dir, meta["file_name"]),
            lazy=self.mode == "train",
        )
        target = self.coco.loadAnns(self.coco.getAnnIds(imgIds=img_id))
        mask = Image.fromarray(
            self._gen_seg_mask(target, meta["height"], meta["width"])
        )
        img_t, mask_t = self.transform_pair(img, mask, index)
        return img_t, mask_t, meta["file_name"]
