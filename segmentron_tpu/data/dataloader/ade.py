"""ADE20K (reference: ``segmentron/data/dataloader/ade.py``).

150 classes; raw labels are 1..150 with 0 = unlabeled, shifted by -1 so
ignore becomes -1.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from .seg_data_base import SegmentationDataset

__all__ = ["ADE20KSegmentation"]


class ADE20KSegmentation(SegmentationDataset):
    NUM_CLASS = 150
    CLASSES = (
        "wall", "building", "sky", "floor", "tree", "ceiling", "road",
        "bed", "windowpane", "grass", "cabinet", "sidewalk", "person",
        "earth", "door", "table", "mountain", "plant", "curtain", "chair",
        "car", "water", "painting", "sofa", "shelf", "house", "sea",
        "mirror", "rug", "field", "armchair", "seat", "fence", "desk",
        "rock", "wardrobe", "lamp", "bathtub", "railing", "cushion",
        "base", "box", "column", "signboard", "chest of drawers",
        "counter", "sand", "sink", "skyscraper", "fireplace",
        "refrigerator", "grandstand", "path", "stairs", "runway", "case",
        "pool table", "pillow", "screen door", "stairway", "river",
        "bridge", "bookcase", "blind", "coffee table", "toilet", "flower",
        "book", "hill", "bench", "countertop", "stove", "palm",
        "kitchen island", "computer", "swivel chair", "boat", "bar",
        "arcade machine", "hovel", "bus", "towel", "light", "truck",
        "tower", "chandelier", "awning", "streetlight", "booth",
        "television", "airplane", "dirt track", "apparel", "pole", "land",
        "bannister", "escalator", "ottoman", "bottle", "buffet", "poster",
        "stage", "van", "ship", "fountain", "conveyer belt", "canopy",
        "washer", "plaything", "swimming pool", "stool", "barrel",
        "basket", "waterfall", "tent", "bag", "minibike", "cradle",
        "oven", "ball", "food", "step", "tank", "trade name", "microwave",
        "pot", "animal", "bicycle", "lake", "dishwasher", "screen",
        "blanket", "sculpture", "hood", "sconce", "vase", "traffic light",
        "tray", "ashcan", "fan", "pier", "crt screen", "plate", "monitor",
        "bulletin board", "shower", "radiator", "glass", "clock", "flag",
    )

    def __init__(
        self,
        root: str = "datasets/ade",
        split: str = "train",
        mode=None,
        **kwargs,
    ):
        super().__init__(root, split, mode, **kwargs)
        base = os.path.join(self.root, "ADEChallengeData2016")
        sub = "training" if split == "train" else "validation"
        image_dir = os.path.join(base, "images", sub)
        mask_dir = os.path.join(base, "annotations", sub)
        if not os.path.isdir(image_dir):
            raise RuntimeError(f"Image dir not found: {image_dir}")
        names = sorted(
            os.path.splitext(f)[0] for f in os.listdir(image_dir) if f.endswith(".jpg")
        )
        self.images = [os.path.join(image_dir, f"{n}.jpg") for n in names]
        self.masks = [os.path.join(mask_dir, f"{n}.png") for n in names]

    def __len__(self) -> int:
        return len(self.images)

    @property
    def pred_offset(self) -> int:
        return 1

    def _mask_transform(self, mask: Image.Image) -> np.ndarray:
        return (np.asarray(mask, np.int32) - 1).astype(np.int32)

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
